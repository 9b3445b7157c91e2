"""Interop with the reference's torch checkpoint formats.

`torch_import` maps the reference `TriplaneUNetModelSmall[Raw]` /
`AutoEncoderGroup{V3,Skip,PBR}` state dicts (`src/diffusion/train_util.py:258-281`
EMA files; `src/encoding/model.py:141-176` ckpt bundles) to this framework's
parameter pytrees and back, so published Sin3DM checkpoints load directly.
"""

from .torch_import import (  # noqa: F401
    ae_bundle_to_tree,
    ae_params_from_state_dict,
    ae_state_dict_from_params,
    import_ae_ckpt,
    import_diffusion_ema,
    is_torch_file,
    load_torch_file,
    unet_params_from_state_dict,
    unet_state_dict_from_params,
)
