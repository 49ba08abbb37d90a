from .row_flow_v2 import RowFlowV2
from .row_flow_v3 import RowFlowV3
from .mlbw import MLBW
from .depth_aa import DepthAA, depth_aa_infer
from .sod_v1 import SODV1
from .da3mono_disparity import DA3MonoDisparity
