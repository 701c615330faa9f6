"""TPU-native compute ops.

XLA-lowered reference implementations live beside fused Pallas kernels; the
``use_pallas`` flags pick the fused path on TPU backends.
"""

from lfb_tpu.ops.affine import affine_nd
from lfb_tpu.ops.conv3d import conv3d
from lfb_tpu.ops.pooling import avg_pool_3d, max_pool_3d, max_pool_2d
from lfb_tpu.ops.attention import scaled_softmax_attention
from lfb_tpu.ops.roi_align import roi_align
