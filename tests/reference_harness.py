"""Import harness for the read-only reference repo (/root/reference).

Provides a minimal ``timm`` shim (the only missing dependency of the
reference model code) and imports the reference's torch modules for
black-box parity testing. Nothing from the reference is copied into the
framework — these imports exist only inside the test process.
"""

import sys
import types
from pathlib import Path

import torch
import torch.nn as nn

REFERENCE = Path("/root/reference")


def _install_timm_shim():
    if "timm" in sys.modules:
        return

    def to_2tuple(v):
        return v if isinstance(v, tuple) else (v, v)

    def trunc_normal_(tensor, mean=0.0, std=1.0, a=-2.0, b=2.0):
        with torch.no_grad():
            tensor.normal_(mean, std).clamp_(a * std, b * std)
        return tensor

    class DropPath(nn.Module):
        def __init__(self, drop_prob=0.0):
            super().__init__()
            self.drop_prob = drop_prob

        def forward(self, x):
            if self.drop_prob == 0.0 or not self.training:
                return x
            keep = 1 - self.drop_prob
            shape = (x.shape[0],) + (1,) * (x.ndim - 1)
            mask = torch.bernoulli(torch.full(shape, keep, device=x.device))
            return x / keep * mask

    timm = types.ModuleType("timm")
    timm_models = types.ModuleType("timm.models")
    timm_layers = types.ModuleType("timm.models.layers")
    timm_layers.to_2tuple = to_2tuple
    timm_layers.trunc_normal_ = trunc_normal_
    timm_layers.DropPath = DropPath
    timm.models = timm_models
    timm_models.layers = timm_layers
    sys.modules["timm"] = timm
    sys.modules["timm.models"] = timm_models
    sys.modules["timm.models.layers"] = timm_layers


def import_reference_models():
    """Returns the reference's ``models`` package, importable read-only."""
    if not REFERENCE.exists():
        return None
    _install_timm_shim()
    if str(REFERENCE) not in sys.path:
        sys.path.insert(0, str(REFERENCE))
    import models  # noqa: F401  (reference package)

    return models
