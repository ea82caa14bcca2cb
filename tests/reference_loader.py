"""Import helper for the read-only PyTorch reference at /root/reference.

Used ONLY as a golden oracle in parity tests: we instantiate the reference's
torch modules, convert their state dicts with audiotokenization_tpu.convert,
and require numerical agreement. The reference vendors lucidrains
vector-quantize-pytorch which imports `einx` (not installed); the symbols the
codec path actually touches never call into einx, so a minimal stub module is
injected before import.
"""
import sys
import types
from pathlib import Path

import pytest

REF = Path("/root/reference/BigCodec_SSL")


def load_reference():
    if not REF.exists():
        pytest.skip("reference tree not mounted")
    if "einx" not in sys.modules:
        einx = types.ModuleType("einx")

        def _unavailable(*a, **k):
            raise RuntimeError("einx stub: not available in tests")

        def _get_at(pattern, tensor, index):
            # Functional gather for the exact patterns the vendored VQ library
            # uses (QINCo / learnable-codebook eval paths). Semantics: the
            # bracketed axis of `tensor` is indexed by `index`, whose axes
            # align by name with the surrounding tensor axes.
            import torch as _t
            if pattern == "h [c] d, h b n -> h b n d":
                h, b, n = index.shape
                out = tensor[_t.arange(h)[:, None], index.reshape(h, -1)]
                return out.reshape(h, b, n, tensor.shape[-1])
            if pattern == "h b n [c] d, h b n -> h b n d":
                return _t.take_along_dim(
                    tensor, index[..., None, None], dim=-2).squeeze(-2)
            if pattern == "b n [c] d, b n -> b n d":
                return _t.take_along_dim(
                    tensor, index[..., None, None], dim=-2).squeeze(-2)
            if pattern == "[c] d, b n -> b n d":
                return tensor[index]
            if pattern == "q [c] d, b n q -> q b n d":
                q = tensor.shape[0]
                idx = index.permute(2, 0, 1)  # (q, b, n)
                out = tensor[_t.arange(q)[:, None], idx.reshape(q, -1)]
                return out.reshape(q, *idx.shape[1:], tensor.shape[-1])
            raise RuntimeError(f"einx stub: unsupported get_at pattern {pattern!r}")

        for name in ("rearrange", "add", "multiply", "where", "less",
                     "greater", "equal", "logsumexp", "softmax", "dot", "sum"):
            setattr(einx, name, _unavailable)
        einx.get_at = _get_at
        sys.modules["einx"] = einx
        nn_mod = types.ModuleType("einx.nn")
        tor = types.ModuleType("einx.nn.torch")
        sys.modules["einx.nn"] = nn_mod
        sys.modules["einx.nn.torch"] = tor
    if "torchaudio" not in sys.modules:
        # common/audio.py imports torchaudio at module scope but the codec
        # paths only use torch.stft; stub it so the discriminators import.
        # A real ModuleSpec is required: transformers probes availability via
        # importlib.util.find_spec, which raises on __spec__ = None.
        import importlib.machinery

        ta = types.ModuleType("torchaudio")
        ta.__spec__ = importlib.machinery.ModuleSpec("torchaudio", loader=None)
        ta.transforms = types.ModuleType("torchaudio.transforms")
        ta.transforms.__spec__ = importlib.machinery.ModuleSpec(
            "torchaudio.transforms", loader=None)
        sys.modules["torchaudio"] = ta
        sys.modules["torchaudio.transforms"] = ta.transforms
    if str(REF) not in sys.path:
        sys.path.insert(0, str(REF))
    import vq  # noqa: F401

    return sys.modules["vq"]


def load_reference_module(name: str):
    """Import an arbitrary reference module (e.g. 'module.mpd') with stubs."""
    load_reference()
    import importlib

    return importlib.import_module(name)
