"""Configuration tree for visualrwkv_tpu.

One typed dataclass tree replaces the reference's ~45 argparse flags +
cross-module environment variables (reference: VisualRWKV-v7/v7.00/train.py:16-66,
RWKV_CTXLEN/RWKV_HEAD_SIZE_A env config at train.py:99-100).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Any, Optional, Tuple


def _round_up(x: float, m: int) -> int:
    return int((int(x) + m - 1) // m * m)


@dataclass(frozen=True)
class RWKVConfig:
    """RWKV language model configuration (v7 "x070" or v6 "x060")."""

    n_layer: int = 12
    n_embd: int = 768
    vocab_size: int = 65536
    version: str = "x070"  # "x070" | "x060" | "x052" (legacy RWKV-5.2)
    head_size: int = 64  # RWKV_HEAD_SIZE_A
    head_size_divisor: int = 8
    ctx_len: int = 2048
    dim_att: int = 0  # 0 -> n_embd
    dim_ffn: int = 0  # 0 -> 4x (x070) / 3.5x rounded to 32 (x060)
    dropout: float = 0.0
    chunk_len: int = 16  # WKV chunk length (T padded to a multiple of this)
    # compute dtype for matmuls; params are kept fp32
    compute_dtype: str = "bfloat16"

    def __post_init__(self):
        if self.dim_att == 0:
            object.__setattr__(self, "dim_att", self.n_embd)
        if self.dim_ffn == 0:
            if self.version in ("x070", "x040"):
                # reference: 4x for v7 CMix (src/model.py:214); RWKV-4 World
                # models also ship 4x FFNs
                object.__setattr__(self, "dim_ffn", self.n_embd * 4)
            else:
                # reference: 3.5x rounded to 32 for v5/v6 (train.py:104)
                object.__setattr__(self, "dim_ffn", _round_up(self.n_embd * 3.5, 32))

    @property
    def n_head(self) -> int:
        assert self.dim_att % self.head_size == 0
        return self.dim_att // self.head_size

    # LoRA dims follow the reference "suggestion" formulas (src/model.py:118-140)
    @property
    def d_decay_lora(self) -> int:
        return max(32, _round_up(round(1.8 * self.n_embd**0.5), 32))

    @property
    def d_aaa_lora(self) -> int:
        return max(32, _round_up(round(1.8 * self.n_embd**0.5), 32))

    @property
    def d_mv_lora(self) -> int:
        return max(32, _round_up(round(1.3 * self.n_embd**0.5), 32))

    @property
    def d_gate_lora(self) -> int:
        return max(32, _round_up(round(0.6 * self.n_embd**0.8), 32))


@dataclass(frozen=True)
class VisionConfig:
    """Vision backbone ensemble configuration."""

    towers: Tuple[str, ...] = ("dino", "siglip", "sam")  # or ("siglip",), ("clip",)
    image_size: int = 448
    sam_image_size: int = 1024
    # per-tower feature dims (dino-L=1024, siglip-so400m=1152, sam-b neck+s2d=1024)
    dino_dim: int = 1024
    siglip_dim: int = 1152
    sam_dim: int = 1024
    clip_dim: int = 1024
    # optional mapping tower-name -> ViTConfig/SAMConfig overriding the default
    # architectures (used for custom/smoke-test towers)
    tower_config_overrides: Any = None

    @property
    def embed_dim(self) -> int:
        dims = {"dino": self.dino_dim, "siglip": self.siglip_dim,
                "sam": self.sam_dim, "clip": self.clip_dim}
        return sum(dims[t] for t in self.towers)


@dataclass(frozen=True)
class VLMConfig:
    """VisualRWKV multimodal assembly configuration."""

    rwkv: RWKVConfig = field(default_factory=RWKVConfig)
    vision: VisionConfig = field(default_factory=VisionConfig)
    proj_type: str = "mlp"  # "linear" | "mlp" (gated MLP, reference MLPWithContextGating)
    num_token_per_image: int = 1024
    image_position: str = "first"  # "first" | "middle" | "last" (v6.0 sandwich prompts)
    n_vtc_layer: int = 0  # visual token compressor depth (v7.03); 0 = disabled
    bidirectional_image: bool = False  # v6.0/HD/UHD odd-layer image-span flip
    image_scanning: str = "unidirection"  # v5.1 patch scan order
    grid_size: int = -2  # v5/v6.0 grid pooling (-2 = adaptive pooling instead)
    uhd_fusion: bool = False  # UHD global+2x2-tile fusion (doubles proj in-dim)
    # "scatter": image tokens pre-expanded to num_token_per_image slots and
    # features scattered in place (v7.00). "leftpad": ONE un-expanded image
    # token per sample; pre-image text is left-padded so image spans align
    # batch-wide and features are inserted at embedding level with no fixed
    # token count (v6.0/src/model.py:487-570).
    insertion_mode: str = "scatter"

    @property
    def projector_in_dim(self) -> int:
        return self.vision.embed_dim * (2 if self.uhd_fusion else 1)

    def replace(self, **kw) -> "VLMConfig":
        return dataclasses.replace(self, **kw)


@dataclass(frozen=True)
class TrainConfig:
    """Trainer configuration (reference train.py flags + trainer.py schedule)."""

    lr_init: float = 6e-4
    lr_final: float = 1e-5
    warmup_steps: int = -1
    beta1: float = 0.9
    beta2: float = 0.99
    adam_eps: float = 1e-8
    weight_decay: float = 0.0
    weight_decay_final: float = -1.0
    grad_clip: float = 1.0
    micro_bsz: int = 2
    accumulate_grad_batches: int = 1
    epoch_steps: int = 1000
    epoch_count: int = 2
    epoch_begin: int = 0
    epoch_save: int = 1
    # activation checkpointing per block: False | True (full per-block remat)
    # | "dots" (save MXU outputs, recompute elementwise only). MEASURED at
    # 0B4/B2/T2048 stacked: dots is ~9% SLOWER than full remat (13.9k vs
    # 15.2k tok/s) AND needs ~3 GB more HBM - the backward is WKV-kernel
    # bound, not projection-recompute bound. Default stays full.
    grad_cp: Any = True
    # chunked-CE T-chunk. r5 profile: at 128 the fp32 [C, vocab] head-wgrad
    # accumulator is re-read/written every chunk (64x/step at 0B4 B2a4 =
    # 51 ms, 6% of the step, pure accumulator traffic). Bigger chunks are
    # monotonically faster (measured at 0B4: 512 +2.4%, 1024 +3.5%,
    # 2048=T +6.1% -> 36% MFU) but cost a B*chunk*vocab*4-byte fp32 logits
    # buffer per chunk (1.07 GB at chunk=T); at the 1B5-on-one-chip HBM
    # edge even 512's 268 MB OOMs (measured). The default stays the
    # edge-safe 128; raise it explicitly when HBM allows (the 0B4 bench
    # legs run 2048).
    ce_chunk_t: int = 128
    # freezing controls (reference model.py:368-388, train.py:192-196)
    freeze_rwkv_layers: int = 0
    freeze_emb: bool = False
    freeze_proj: bool = False
    enable_state_tuning: bool = False
    # parallelism: data-parallel mesh size is taken from the runtime mesh
    zero_stage: int = 1  # 0: replicated opt state, 1: sharded opt state (ZeRO-1)
    # host-offloaded optimizer state (DeepSpeedCPUAdam analog): places m/v in
    # pinned host memory via memory_kind; TPU backends only
    offload_optimizer: bool = False
    # parameter storage dtype: "float32" (default) or "bfloat16" (params +
    # grads in bf16, fp32 master weights kept in the optimizer state)
    param_dtype: str = "float32"
    # optimizer numerics for low-precision params:
    #   "master_fp32" (default): fp32 master weights + fp32 Adam moments in
    #     the optimizer state (DeepSpeed bf16-mode analog; 12 bytes/param of
    #     optimizer HBM on top of the bf16 params).
    #   "bf16_sr": NO master weights; Adam moments stored bf16 (math fp32
    #     per step) and the bf16 params updated with STOCHASTIC ROUNDING so
    #     sub-ulp updates advance in expectation instead of rounding to zero
    #     (the Gopher/large-scale bf16-SR recipe). 4 bytes/param of optimizer
    #     state — makes 1B5 full-Adam training fit a single 16 GB chip.
    optim_precision: str = "master_fp32"
    # stacked-layer parameter layout: blocks 1..L-1 stored as leading-axis
    # stacks so the layer loop compiles as ONE lax.scan body (compile time
    # O(1) in depth; ~5x faster at 1B5). x070-only; checkpoints stay in the
    # canonical list-of-blocks layout. Ignored when incompatible options are
    # set (partial layer freeze, tensor parallelism, bidirectional image).
    stacked_layers: bool = False
    # split the train step into TWO dispatches (grad program, then optimizer
    # program) instead of one fused jit. Near the single-chip HBM edge the
    # fused program's buffer assignment must co-schedule the whole backward
    # with the whole optimizer update; measured at 1B5 bf16_sr this produced
    # a ~25x runtime pathology (XLA serializes/spills under pressure) while
    # the same math as two programs runs at full speed — each program's peak
    # stays well under the edge and per-leaf temps free eagerly. None (auto):
    # split when (2*params + opt_state) bytes exceed 60% of one chip's HBM on
    # a single-device TPU mesh. The extra dispatch costs one RTT (~30 ms).
    split_step: Optional[bool] = None
    # split-step optimizer leaf-group size (MB). Each barrier-sequenced
    # group materializes fp32 temps ~6x its bf16 bytes and two groups
    # co-live at each barrier seam, so the opt program's temp peak scales
    # with this. 2026-08-20: the serving environment began reserving more
    # HBM server-side and the 128 MB grouping that compiled at 15.06/15.75
    # GB in round 4 started RESOURCE_EXHAUSTING at load; 64 MB restores
    # ~1.4 GB of headroom for a few ms of extra barrier latency per step.
    opt_partition_mb: int = 64
    wandb_project: str = ""
