from .interp import (
    resize_bilinear_align_corners,
    resize_linear_align_corners_1d,
)
from .attention import linear_attention
from .dwconv import depthwise_conv2d
