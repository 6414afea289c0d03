"""Checkpoint conversion CLI: reference .pt -> orbax parameter trees.

Converts any of the published checkpoint families (stage-1 fairseq variants,
vocoder g_/do_, AV-HuBERT pretrained, HuBERT-base unit teacher, RTVC speaker
encoder) into this framework's native checkpoints so serving never needs
torch at runtime.
"""

from __future__ import annotations

import argparse
import json

import jax


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--kind", required=True,
                   choices=["stage1", "vocoder_g", "vocoder_do", "speaker"])
    p.add_argument("--preset", default="multi_target",
                   help="stage1 only: which variant preset")
    p.add_argument("--input", required=True, help=".pt checkpoint path")
    p.add_argument("--output", required=True, help="orbax output dir")
    args = p.parse_args()

    from lip2speech_tpu.convert import torch_to_jax as conv
    from lip2speech_tpu.core.config import preset
    from lip2speech_tpu.train.checkpoint import save_pytree

    sd = conv.load_torch_state(args.input)

    if args.kind == "stage1":
        cfg = preset(args.preset)
        tree = conv.convert_multi_target(sd, cfg.model)
    elif args.kind == "vocoder_g":
        cfg = preset("multi_target")
        tree = {"generator": conv.convert_vocoder_generator(sd, cfg.vocoder)}
    elif args.kind == "vocoder_do":
        mpd, msd, spectral = conv.convert_vocoder_discriminators(sd)
        tree = {"mpd": mpd, "msd": msd, "msd_spectral": spectral}
    elif args.kind == "speaker":
        from lip2speech_tpu.models.speaker import convert_rtvc_encoder

        tree = {"params": convert_rtvc_encoder(sd)}

    save_pytree(args.output, tree)
    n = sum(x.size for x in jax.tree_util.tree_leaves(tree))
    print(json.dumps({"kind": args.kind, "output": args.output,
                      "n_params": int(n)}))


if __name__ == "__main__":
    main()
