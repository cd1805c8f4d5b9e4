"""PyTorch checkpoint <-> JAX parameter converters.

Imports reference RWKV / VisualRWKV ``.pth`` state dicts (key layout per
VisualRWKV-v7/v7.00/src/model.py:76-325 and train.py:182-191) into the
functional parameter pytrees of :mod:`visualrwkv_tpu.models`, and exports back
for interop with the reference demo apps (reference export.py splits combined
checkpoints the same way).

Layout rules:
- torch ``nn.Linear.weight`` is ``[out, in]``; ours is ``[in, out]`` -> transpose.
- reference time-mix params are ``(1, 1, C)``; ours are ``(C,)``.
- ``att.r_k`` stays ``(H, N)``; GroupNorm ``ln_x.{weight,bias}`` stays ``(C,)``.
"""

from __future__ import annotations

import re
from typing import Any, Dict, Mapping

import numpy as np

Params = Dict[str, Any]

# torch Linear leaves (transpose to [in, out])
_LINEAR_RE = re.compile(
    r"\.(receptance|key|value|output|head|gate|o_proj)\.weight$|^head\.weight$"
)
# 2-D LoRA mats kept as-is (reference stores them math-ready: x @ w1 @ w2)
_LORA_KEYS = {"w1", "w2", "a1", "a2", "v1", "v2", "g1", "g2"}


def _to_numpy(t) -> np.ndarray:
    if hasattr(t, "detach"):
        return t.detach().to("cpu").float().numpy()
    return np.asarray(t, np.float32)


def _assign(tree: Params, path: list, value: np.ndarray) -> None:
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def import_rwkv_state_dict(state_dict: Mapping[str, Any]) -> Params:
    """Convert a reference RWKV LM state dict into our parameter pytree.

    Handles both bare-LM checkpoints (``blocks.0...``) and VisualRWKV combined
    checkpoints with a ``rwkv.`` prefix.
    """
    out: Params = {"blocks": {}}
    for key, tensor in state_dict.items():
        if key.startswith("rwkv."):
            key = key[len("rwkv."):]
        arr = _to_numpy(tensor)
        parts = key.split(".")

        if parts[0] == "blocks":
            layer = int(parts[1])
            sub = parts[2:]
            blk = out["blocks"].setdefault(layer, {})
            leaf = sub[-2] if sub[-1] in ("weight", "bias") else sub[-1]
            if sub[-1] == "weight" and _LINEAR_RE.search(key):
                _assign(blk, sub[:-2] + [leaf, "weight"], arr.T)
            elif leaf in _LORA_KEYS:
                _assign(blk, sub, arr)
            elif arr.ndim == 3 and arr.shape[:2] == (1, 1):
                # (1,1,C) time-mix / w0 / a0 / v0 / k_k / k_a params
                _assign(blk, sub, arr.reshape(-1))
            else:
                _assign(blk, sub, arr)
        elif key == "emb.weight":
            out["emb"] = {"weight": arr}
        elif key == "head.weight":
            out["head"] = {"weight": arr.T}
        elif parts[0] == "ln_out":
            out.setdefault("ln_out", {})[parts[1]] = arr
        else:
            raise KeyError(f"unrecognized RWKV checkpoint key: {key}")

    # dict-of-int -> ordered list
    layers = sorted(out["blocks"])
    assert layers == list(range(len(layers))), f"missing layers: {layers}"
    out["blocks"] = [out["blocks"][i] for i in layers]
    return out


def detect_rwkv_version(state_dict: Mapping[str, Any]) -> Dict[str, Any]:
    """Autodetect the RWKV generation + geometry from state-dict keys.

    Reimplements the reference engine's detector (app/modeling_rwkv.py:
    227-244: ln_x => v5, gate.weight => v5.1, 2-D time_decay => v5.2,
    time_maa => v6) extended with the v7 signature (att.r_k / att.w0).
    Returns {"version": "x052"|"x060"|"x070", "n_layer", "n_embd",
    "vocab_size", "head_size", "n_head"}; raises on pre-5.2 generations
    (VisualRWKV's v5 releases are all RWKV-5.2 World models).
    """
    # restrict to LM keys: combined VisualRWKV checkpoints carry vision-tower
    # keys like "vit.dino_featurizer.blocks.0..." whose "blocks." segment
    # would both crash the layer-index parse and inflate n_layer
    lm_prefixes = ("emb.", "blocks.", "ln_out.", "head.")
    keys = {}
    for k, v in state_dict.items():
        k = k[len("rwkv."):] if k.startswith("rwkv.") else k
        if k.startswith(lm_prefixes):
            keys[k] = v

    def shape_of(t):
        return tuple(getattr(t, "shape", np.asarray(t).shape))

    # pass 1: version from key signatures alone (insertion-order independent;
    # the reference scans keys in order, which mis-versions dicts where a
    # block's time_decay precedes its ln_x). v4 needs POSITIVE evidence (its
    # aa/bb/pp-era time_first/time_decay keys) — a dict with no recognizable
    # LM keys must raise, not import as an empty x040 model.
    version = 0.0
    for k, t in keys.items():
        if k.endswith("att.time_first") or k.endswith("att.time_decay"):
            version = max(4.0, version)
        if "ln_x" in k:
            version = max(5.0, version)
        if "gate.weight" in k:
            version = max(5.1, version)
        if k.endswith("att.time_decay") and len(shape_of(t)) > 1 and shape_of(t)[1] > 1:
            version = max(5.2, version)
        if "time_maa" in k:
            version = max(6.0, version)
        if k.endswith("att.r_k") or k.endswith("att.w0"):
            version = max(7.0, version)

    # pass 2: geometry, by detected version
    n_layer = 0
    n_head = None
    head_size = None
    for k, t in keys.items():
        if k.startswith("blocks."):
            n_layer = max(n_layer, int(k.split(".")[1]) + 1)
        if 5.0 <= version < 6.0 and k.endswith("att.time_decay"):
            shape = shape_of(t)
            n_head = shape[0]
            if len(shape) > 1 and shape[1] > 1:
                head_size = shape[1]
        if 6.0 <= version < 7.0 and k.endswith("att.time_faaaa"):
            n_head, head_size = shape_of(t)[:2]
        if version >= 7.0 and k.endswith("att.r_k"):
            n_head, head_size = shape_of(t)[:2]
    emb = keys.get("emb.weight")
    vocab_size, n_embd = (
        tuple(getattr(emb, "shape", np.asarray(emb).shape)) if emb is not None
        else (None, None)
    )
    name = {4.0: "x040", 5.2: "x052", 6.0: "x060", 7.0: "x070"}.get(version)
    if version == 0.0:
        raise ValueError(
            "no RWKV LM keys recognized in the state dict (expected "
            "emb./blocks./ln_out./head. entries with att.time_* signatures); "
            "is this a vision-only or non-RWKV checkpoint?"
        )
    if name is None:
        raise NotImplementedError(
            f"detected legacy RWKV v{version:.1f} checkpoint; supported "
            "generations are 4 (x040), 5.2 (x052), 6 (x060) and 7 (x070)"
        )
    if version == 4.0:
        # headless per-channel recurrence: the adapter-era World models
        # (VisualRWKV-v4 pairs a frozen RWKV-4 RNN with the BLIP2-style
        # adapter; rwkv_rnn.py state layout aa/bb/pp per channel)
        n_head, head_size = 1, n_embd
    if head_size is None and n_embd is not None and n_head:
        head_size = n_embd // n_head
    return {
        "version": name, "n_layer": n_layer, "n_embd": n_embd,
        "vocab_size": vocab_size, "head_size": head_size, "n_head": n_head,
    }


def export_rwkv_state_dict(params: Params, prefix: str = "") -> Dict[str, np.ndarray]:
    """Inverse of :func:`import_rwkv_state_dict` (numpy state dict, fp32)."""
    sd: Dict[str, np.ndarray] = {}

    def walk(node, path):
        if isinstance(node, dict):
            for k, v in node.items():
                walk(v, path + [k])
        elif isinstance(node, list):
            for i, v in enumerate(node):
                walk(v, path + [str(i)])
        else:
            key = ".".join(path)
            arr = np.asarray(node, np.float32)
            if key.endswith("weight") and _LINEAR_RE.search(key):
                arr = arr.T
            elif path[-1] in (
                "x_r", "x_w", "x_k", "x_v", "x_a", "x_g",
                "w0", "a0", "v0", "k_k", "k_a",
                "time_maa_x", "time_maa_w", "time_maa_k", "time_maa_v",
                "time_maa_r", "time_maa_g", "time_decay",
                "time_mix_k", "time_mix_v", "time_mix_r", "time_mix_g",
            ) and arr.ndim == 1:
                arr = arr.reshape(1, 1, -1)
            sd[prefix + key] = arr

    walk(params, [])
    return sd


def load_pth(path: str) -> Dict[str, np.ndarray]:
    """Load a .pth file to numpy (torch is only needed here, on the host)."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    return {k: _to_numpy(v) for k, v in sd.items()}


def import_visualrwkv_checkpoint(
    sd_or_path, dst_grid: int = 32, sam_downsample: bool = True
) -> Params:
    """Combined released VisualRWKV checkpoint -> ``{"rwkv", "proj", "vit"}``.

    The reference saves the whole LightningModule state dict (keys ``rwkv.*``,
    ``proj.*``, ``vit.{dino,siglip,sam}_featurizer.*``; export.py:14-27 splits
    on the same prefixes). Towers inside are timm / vendored-SAM layouts.
    ``dst_grid``: patch grid of the serving resolution (448/14 = 32).
    """
    sd = load_pth(sd_or_path) if isinstance(sd_or_path, str) else sd_or_path
    from visualrwkv_tpu.convert.vision_import import import_sam_vision, import_timm_vit

    def strip(prefix):
        plen = len(prefix)
        return {k[plen:]: v for k, v in sd.items() if k.startswith(prefix)}

    params: Params = {"rwkv": import_rwkv_state_dict(strip("rwkv."))}

    proj_sd = strip("proj.")
    if "weight" in proj_sd and len(proj_sd) == 1:  # linear projector
        params["proj"] = {"weight": _to_numpy(proj_sd["weight"]).T}
    elif proj_sd:  # MLPWithContextGating (model.py:328-338)
        params["proj"] = {
            "gate": {"weight": _to_numpy(proj_sd["gate.weight"]).T},
            "o_proj": {"weight": _to_numpy(proj_sd["o_proj.weight"]).T},
            "ln_v": {
                "weight": _to_numpy(proj_sd["ln_v.weight"]),
                "bias": _to_numpy(proj_sd["ln_v.bias"]),
            },
        }

    vit: Params = {}
    dino_sd = strip("vit.dino_featurizer.")
    if dino_sd:
        vit["dino"] = import_timm_vit(dino_sd, dst_grid)
    siglip_sd = strip("vit.siglip_featurizer.")
    if siglip_sd:
        vit["siglip"] = import_timm_vit(siglip_sd, dst_grid)
    sam_sd = strip("vit.sam_featurizer.")
    if sam_sd:
        vit["sam"] = import_sam_vision(sam_sd)
    if vit:
        params["vit"] = vit
    return params
