"""Vision tower parity vs HF-transformers implementations (random weights,
tiny configs): DINOv2-with-registers, SigLIP, SAM. Validates both the JAX
implementations and the weight converters."""

import numpy as np
import pytest
import torch

from visualrwkv_tpu.convert.vision_import import (
    import_dinov2_vision,
    import_sam_vision,
    import_siglip_vision,
)
from visualrwkv_tpu.vision.sam import SAMConfig, sam_features
from visualrwkv_tpu.vision.vit import ViTConfig, vit_features


def rel_err(x, y):
    x, y = np.asarray(x, np.float64), np.asarray(y, np.float64)
    return np.sqrt(((x - y) ** 2).sum() / max(1e-30, (y**2).sum()))


@pytest.mark.slow
def test_siglip_parity():
    from transformers import SiglipVisionConfig, SiglipVisionModel

    torch.manual_seed(0)
    hf_cfg = SiglipVisionConfig(
        hidden_size=64, intermediate_size=128, num_hidden_layers=4,
        num_attention_heads=4, image_size=32, patch_size=8,
        hidden_act="gelu_pytorch_tanh",
    )
    hf = SiglipVisionModel(hf_cfg).eval()
    pixels = torch.randn(2, 3, 32, 32)
    with torch.no_grad():
        hs = hf(pixels, output_hidden_states=True).hidden_states

    cfg = ViTConfig(
        img_size=32, patch_size=8, width=64, depth=4, heads=4, mlp_dim=128,
        act="gelu_tanh", use_cls=False, num_reg=0, layerscale=False,
        compute_dtype="float32",
    )
    params = import_siglip_vision(hf.state_dict(), cfg.grid)
    feats = vit_features(params, cfg, np.asarray(pixels.permute(0, 2, 3, 1)))
    ref = hs[3].numpy()  # output of block index 2 == second-to-last of 4
    assert rel_err(feats, ref) < 2e-5


@pytest.mark.slow
def test_dinov2_reg_parity():
    from transformers import Dinov2WithRegistersConfig, Dinov2WithRegistersModel

    torch.manual_seed(1)
    hf_cfg = Dinov2WithRegistersConfig(
        hidden_size=64, num_hidden_layers=4, num_attention_heads=4,
        mlp_ratio=2, image_size=32, patch_size=8, num_register_tokens=4,
        hidden_act="gelu",
    )
    hf = Dinov2WithRegistersModel(hf_cfg).eval()
    pixels = torch.randn(2, 3, 32, 32)
    with torch.no_grad():
        hs = hf(pixels, output_hidden_states=True).hidden_states

    cfg = ViTConfig(
        img_size=32, patch_size=8, width=64, depth=4, heads=4, mlp_dim=128,
        act="gelu", use_cls=True, num_reg=4, layerscale=True,
        compute_dtype="float32",
    )
    params = import_dinov2_vision(hf.state_dict(), cfg.grid)
    feats = vit_features(params, cfg, np.asarray(pixels.permute(0, 2, 3, 1)))
    ref = hs[3][:, 1 + 4 :].numpy()  # strip cls+registers
    assert rel_err(feats, ref) < 2e-5


@pytest.mark.slow
def test_clip_parity():
    from transformers import CLIPVisionConfig, CLIPVisionModel

    from visualrwkv_tpu.convert.vision_import import import_clip_vision

    torch.manual_seed(3)
    hf_cfg = CLIPVisionConfig(
        hidden_size=64, intermediate_size=128, num_hidden_layers=4,
        num_attention_heads=4, image_size=32, patch_size=8,
        hidden_act="quick_gelu",
    )
    hf = CLIPVisionModel(hf_cfg).eval()
    pixels = torch.randn(2, 3, 32, 32)
    with torch.no_grad():
        hs = hf(pixels, output_hidden_states=True).hidden_states

    cfg = ViTConfig(
        img_size=32, patch_size=8, width=64, depth=4, heads=4, mlp_dim=128,
        act="quick_gelu", use_cls=True, num_reg=0, layerscale=False,
        pre_ln=True, patch_bias=False, keep_cls_feature=True, ln_eps=1e-5,
        compute_dtype="float32",
    )
    params = import_clip_vision(hf.state_dict(), cfg.grid)
    feats = vit_features(params, cfg, np.asarray(pixels.permute(0, 2, 3, 1)))
    ref = hs[3].numpy()  # includes cls (keep_cls_feature)
    assert feats.shape == ref.shape
    assert rel_err(feats, ref) < 2e-5


@pytest.mark.slow
def test_sam_parity():
    from transformers import SamConfig, SamModel, SamVisionConfig

    torch.manual_seed(2)
    vis_cfg = SamVisionConfig(
        hidden_size=64, num_hidden_layers=4, num_attention_heads=4,
        image_size=32, patch_size=8, window_size=2,
        global_attn_indexes=[1, 3], output_channels=16, mlp_ratio=2,
        use_rel_pos=True, use_abs_pos=True,
    )
    hf = SamModel(SamConfig(vision_config=vis_cfg)).eval()
    pixels = torch.randn(2, 3, 32, 32)
    with torch.no_grad():
        neck_out = hf.vision_encoder(pixels).last_hidden_state  # [B, 16, 4, 4]

    cfg = SAMConfig(
        img_size=32, patch_size=8, width=64, depth=4, heads=4, mlp_dim=128,
        out_chans=16, window_size=2, global_attn_indexes=(1, 3),
        downsample_factor=2, compute_dtype="float32",
    )
    params = import_sam_vision(hf.state_dict())
    feats = sam_features(params, cfg, np.asarray(pixels.permute(0, 2, 3, 1)))
    # replicate reference LosslessDownSampler + flatten on the torch side
    B, C, H, W = neck_out.shape
    f = 2
    t = neck_out.view(B, C, H // f, f, W // f, f).permute(0, 2, 4, 1, 3, 5)
    t = t.reshape(B, H // f, W // f, C * f * f).reshape(B, -1, C * f * f)
    assert feats.shape == tuple(t.shape)
    assert rel_err(feats, t.numpy()) < 2e-5
