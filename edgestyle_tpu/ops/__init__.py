from edgestyle_tpu.ops.norms import group_norm
from edgestyle_tpu.ops.attention import multi_head_attention
