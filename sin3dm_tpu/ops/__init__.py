from .fused_mlp import skip_mlp_fused, skip_mlp_reference
