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


# ---------------------------------------------------------------------------
# The REAL avhubert/hubert.py as an oracle (VERDICT r2 next #6).
#
# hubert.py needs fairseq + omegaconf, neither of which is in this image.
# Everything fairseq provides to it is glue (dataclass bases, registries,
# GradMultiply) EXCEPT TransformerEncoder — the wav2vec2 trunk is fairseq
# code, not reference code, so a faithful torch mirror of it is vendored
# below (same technique as the torchvision stub above). The load-bearing
# reference logic — SubModel wiring, modality fuse order, layer_norm,
# post_extract_proj, zero-fill for absent modalities, modality dropout —
# then runs as the REAL code.
# ---------------------------------------------------------------------------


def _install_fairseq_stub():
    import torch
    import torch.nn as tnn
    import torch.nn.functional as tF
    from torch.nn.utils import weight_norm

    if "fairseq" in sys.modules:
        return

    class SamePad(tnn.Module):
        def __init__(self, kernel_size):
            super().__init__()
            self.remove = 1 if kernel_size % 2 == 0 else 0

        def forward(self, x):
            return x[:, :, : -self.remove] if self.remove else x

    class W2V2Layer(tnn.Module):
        """fairseq TransformerSentenceEncoderLayer (inference mirror)."""

        def __init__(self, dim, heads, ffn, layer_norm_first):
            super().__init__()
            self.heads = heads
            self.layer_norm_first = layer_norm_first
            self.self_attn = tnn.Module()
            for n in ("q_proj", "k_proj", "v_proj", "out_proj"):
                setattr(self.self_attn, n, tnn.Linear(dim, dim))
            self.self_attn_layer_norm = tnn.LayerNorm(dim)
            self.fc1 = tnn.Linear(dim, ffn)
            self.fc2 = tnn.Linear(ffn, dim)
            self.final_layer_norm = tnn.LayerNorm(dim)

        def _attn(self, x, key_padding_mask):
            b, t, d = x.shape
            h = self.heads
            dk = d // h
            q = self.self_attn.q_proj(x).view(b, t, h, dk)
            k = self.self_attn.k_proj(x).view(b, t, h, dk)
            v = self.self_attn.v_proj(x).view(b, t, h, dk)
            s = torch.einsum("bqhd,bkhd->bhqk", q, k) / (dk ** 0.5)
            if key_padding_mask is not None:
                s = s.masked_fill(
                    key_padding_mask[:, None, None, :], float("-inf"))
            p = torch.softmax(s, dim=-1)
            o = torch.einsum("bhqk,bkhd->bqhd", p, v).reshape(b, t, d)
            return self.self_attn.out_proj(o)

        def forward(self, x, key_padding_mask=None):
            if self.layer_norm_first:
                x = x + self._attn(self.self_attn_layer_norm(x),
                                   key_padding_mask)
                y = self.final_layer_norm(x)
                return x + self.fc2(tF.gelu(self.fc1(y)))
            x = self.self_attn_layer_norm(x + self._attn(x, key_padding_mask))
            return self.final_layer_norm(
                x + self.fc2(tF.gelu(self.fc1(x))))

    class TransformerEncoder(tnn.Module):
        """fairseq wav2vec2 TransformerEncoder mirror, fairseq key layout
        (pos_conv.0.{weight_v,weight_g,bias}, layers.N.self_attn...)."""

        def __init__(self, cfg):
            super().__init__()
            dim = cfg.encoder_embed_dim
            conv = tnn.Conv1d(dim, dim, kernel_size=cfg.conv_pos,
                              padding=cfg.conv_pos // 2,
                              groups=cfg.conv_pos_groups)
            self.pos_conv = tnn.Sequential(
                weight_norm(conv, name="weight", dim=2),
                SamePad(cfg.conv_pos), tnn.GELU())
            self.layers = tnn.ModuleList(
                W2V2Layer(dim, cfg.encoder_attention_heads,
                          cfg.encoder_ffn_embed_dim, cfg.layer_norm_first)
                for _ in range(cfg.encoder_layers))
            self.layer_norm_first = cfg.layer_norm_first
            self.layer_norm = tnn.LayerNorm(dim)

        def forward(self, x, padding_mask=None, layer=None):
            if padding_mask is not None:
                x = x.masked_fill(padding_mask[..., None], 0.0)
            x = x + self.pos_conv(x.transpose(1, 2)).transpose(1, 2)
            if not self.layer_norm_first:
                x = self.layer_norm(x)
            for i, lyr in enumerate(self.layers):
                x = lyr(x, padding_mask)
                if layer is not None and i == layer:
                    return x, []
            if self.layer_norm_first:
                x = self.layer_norm(x)
            return x, []

    class GradMultiply(torch.autograd.Function):
        @staticmethod
        def forward(ctx, x, scale):
            ctx.scale = scale
            return x.new(x)

        @staticmethod
        def backward(ctx, grad):
            return grad * ctx.scale, None

    def _mod(name, **attrs):
        m = types.ModuleType(name)
        for k, v in attrs.items():
            setattr(m, k, v)
        sys.modules[name] = m
        return m

    class FairseqDataclass:
        pass

    class Dictionary:
        def __init__(self, symbols=()):
            self.symbols = list(symbols)

        def __len__(self):
            return len(self.symbols)

    fairseq = _mod("fairseq")
    fairseq.utils = _mod(
        "fairseq.utils",
        get_available_activation_fns=lambda: ["relu", "gelu", "tanh"])
    data = _mod("fairseq.data")
    data.data_utils = _mod("fairseq.data.data_utils",
                           compute_mask_indices=None)  # shadowed by .utils
    data.dictionary = _mod("fairseq.data.dictionary", Dictionary=Dictionary)
    _mod("fairseq.dataclass",
         ChoiceEnum=lambda choices: str, FairseqDataclass=FairseqDataclass)
    models = _mod("fairseq.models",
                  BaseFairseqModel=tnn.Module,
                  register_model=lambda name, dataclass=None: (lambda c: c))
    models.wav2vec = _mod("fairseq.models.wav2vec")
    _mod("fairseq.models.wav2vec.wav2vec2",
         ConvFeatureExtractionModel=object,
         TransformerEncoder=TransformerEncoder)
    _mod("fairseq.modules", GradMultiply=GradMultiply,
         LayerNorm=lambda dim, **kw: tnn.LayerNorm(dim, **kw))
    fairseq.data = data
    fairseq.models = models

    if "omegaconf" not in sys.modules:
        import contextlib
        _mod("omegaconf", II=lambda s: s, MISSING="???",
             open_dict=contextlib.nullcontext)


def avhubert_hubert_module():
    """Import the REAL /root/reference/avhubert/hubert.py (AVHubertModel,
    AVHubertConfig) under a synthetic package so its relative imports of
    .resnet/.utils run the real files while the fairseq-owned siblings
    (.hubert_pretraining task plumbing, .decoder) are stubbed."""
    require_ref()
    _install_fairseq_stub()

    pkg_name = "ref_avhubert"
    if f"{pkg_name}.hubert" in sys.modules:
        return sys.modules[f"{pkg_name}.hubert"]

    pkg = types.ModuleType(pkg_name)
    pkg.__path__ = [str(REF / "avhubert")]
    sys.modules[pkg_name] = pkg

    # hubert.py only takes type names from these two fairseq-heavy siblings
    class AVHubertPretrainingConfig:
        pass

    class AVHubertPretrainingTask:
        pass

    hp = types.ModuleType(f"{pkg_name}.hubert_pretraining")
    hp.AVHubertPretrainingConfig = AVHubertPretrainingConfig
    hp.AVHubertPretrainingTask = AVHubertPretrainingTask
    sys.modules[f"{pkg_name}.hubert_pretraining"] = hp
    dec = types.ModuleType(f"{pkg_name}.decoder")
    dec.TransformerDecoder = object
    sys.modules[f"{pkg_name}.decoder"] = dec

    return importlib.import_module(f"{pkg_name}.hubert")
