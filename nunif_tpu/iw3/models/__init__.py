from .row_flow_v2 import RowFlowV2
from .row_flow_v3 import RowFlowV3
from .mlbw import MLBW
from .depth_aa import DepthAA, depth_aa_infer
from .sod_v1 import SODV1
from .da3mono_disparity import DA3MonoDisparity
from .light_inpaint_v1 import LightInpaintV1
from .light_video_inpaint_v1 import LightVideoInpaintV1
from .discriminator import FFCDiscriminator, InpaintL3ConditionalDiscriminator
