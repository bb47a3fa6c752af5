from .conv import (ASPP, Bottleblock, Bottleneck, ConvBlock, ConvNeXtBlock,
                   DeepLabHead, UpsamplingAdd, UpsamplingConcat,
                   resize_bilinear, resize_nearest)
from .ode import GRUODEBayes, softplus_rsample
from .srvp import ConvNet, ResBlock, SELayer, SmallDecoder, SmallEncoder
from .temporal import (BiGRU, Bottleneck3D, CausalConv3d, DualGRUCell,
                       GRUGates, PyramidSpatioTemporalPooling, SpatialGRU,
                       TemporalBlock)
