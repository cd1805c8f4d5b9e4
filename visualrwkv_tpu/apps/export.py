"""Checkpoint export/split tool (reference export.py:1-27).

Splits a combined VisualRWKV checkpoint into the LM half (``*_rwkv.pth``) and
the visual half (``*_visual.pth``) in fp16, for interop with the reference
demo apps; also exports orbax checkpoints back to reference-layout ``.pth``.
"""

from __future__ import annotations

import argparse
from pathlib import Path


def split_state_dict(sd: dict) -> tuple[dict, dict]:
    rwkv = {k[len("rwkv."):]: v for k, v in sd.items() if k.startswith("rwkv.")}
    visual = {k: v for k, v in sd.items() if not k.startswith("rwkv.")}
    return rwkv, visual


def main(argv=None):
    p = argparse.ArgumentParser("visualrwkv_tpu.apps.export")
    p.add_argument("input", type=str, help=".pth or orbax checkpoint dir")
    p.add_argument("--out_prefix", default="", type=str)
    args = p.parse_args(argv)

    import numpy as np
    import torch

    inp = Path(args.input)
    prefix = args.out_prefix or str(inp.with_suffix(""))

    if inp.is_dir():  # orbax -> reference-layout .pth
        import orbax.checkpoint as ocp

        from visualrwkv_tpu.convert.pth_import import export_rwkv_state_dict

        restored = ocp.StandardCheckpointer().restore(str(inp.absolute()))
        params = restored["params"] if "params" in restored else restored
        sd = export_rwkv_state_dict(params["rwkv"], prefix="rwkv.")
        # visual half: keep our (documented) layout for proj/vit
        visual = {}

        def walk(node, path):
            if isinstance(node, dict):
                for k, v in node.items():
                    walk(v, path + [k])
            elif isinstance(node, list):
                for i, v in enumerate(node):
                    walk(v, path + [str(i)])
            else:
                visual[".".join(path)] = np.asarray(node)

        for part in ("proj", "vit"):
            if part in params:
                walk(params[part], [part])
        sd.update(visual)
    else:
        sd = torch.load(inp, map_location="cpu", weights_only=True)
        sd = {k: v for k, v in sd.items()}

    rwkv_half, visual_half = split_state_dict(sd)
    to_t = lambda d: {k: torch.as_tensor(np.asarray(v)).half() for k, v in d.items()}
    torch.save(to_t(rwkv_half), f"{prefix}_rwkv.pth")
    torch.save(to_t(visual_half), f"{prefix}_visual.pth")
    print(f"wrote {prefix}_rwkv.pth ({len(rwkv_half)}) and {prefix}_visual.pth ({len(visual_half)})")


if __name__ == "__main__":
    main()
