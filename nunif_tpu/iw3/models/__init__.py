from .row_flow_v2 import RowFlowV2
from .row_flow_v3 import RowFlowV3
from .mlbw import MLBW
