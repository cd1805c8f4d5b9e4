"""Train-CLI flag plumbing (no training run)."""

from visualrwkv_tpu.train.cli import build_argparser, make_configs


def test_chunk_len_and_wkv_impl_flags():
    args = build_argparser().parse_args(
        ["--chunk_len", "8", "--wkv_impl", "packed", "--n_layer", "2",
         "--vision_towers", ""]
    )
    out = make_configs(args)
    vlm_cfg = out[0] if isinstance(out, tuple) else out
    assert vlm_cfg.rwkv.chunk_len == 8
    assert args.wkv_impl == "packed"


def test_default_chunk_len_is_16():
    args = build_argparser().parse_args(["--vision_towers", ""])
    out = make_configs(args)
    vlm_cfg = out[0] if isinstance(out, tuple) else out
    assert vlm_cfg.rwkv.chunk_len == 16
    assert args.wkv_impl == "auto"
