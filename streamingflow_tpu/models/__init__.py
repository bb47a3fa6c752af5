from .decoder import Decoder
from .distributions import DistributionModule, distribution_forward
from .efficientnet import EfficientNetBackbone
from .encoder import Encoder
from .future_prediction import FuturePredictionODE, merge_observations
from .lidar_encoder import LidarBEVEncoder
from .streamingflow import StreamingFlow
from .temporal_model import TemporalModel, TemporalModelIdentity
