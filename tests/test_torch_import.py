"""Reference-checkpoint import/export: layout parity with torch.

The oracle below *interprets* the reference UNet architecture
(Model/model.py:190-310) directly from a torch state_dict using torch
functional ops, driven by the same static block plan our Flax module is built
from. Converting a random torch checkpoint with
`ipdm_tpu.utils.torch_import.import_state_dict` and running our Flax UNet must
reproduce the oracle's output — this pins down every layout convention
(OIHW↔HWIO, linear transpose, GN scale naming, qkv head-major chunking,
nearest-upsample index rule) end to end.
"""

import math

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from ipdm_tpu.models.unet import UNetModel, group_count  # noqa: E402
from ipdm_tpu.utils.torch_import import (  # noqa: E402
    export_state_dict, import_state_dict, key_map,
    load_torch_checkpoint, save_torch_checkpoint)


def _torch_oracle(model: UNetModel, sd, x_nchw, timesteps):
    """Evaluate the reference architecture from `sd` (numpy state_dict)."""
    sd = {k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()}
    down_plan, middle_ch, up_plan, final_ch = model.plan()
    heads = model.num_heads

    def conv(x, key, stride=1, pad=1):
        return F.conv2d(x, sd[key + ".weight"], sd[key + ".bias"],
                        stride=stride, padding=pad)

    def gn(x, key, c):
        return F.group_norm(x, group_count(c), sd[key + ".weight"],
                            sd[key + ".bias"], eps=1e-5)

    def res(x, emb, key, cin, cout):
        h = conv(F.silu(gn(x, key + ".conv1.0", cin)), key + ".conv1.2")
        temb = F.linear(F.silu(emb), sd[key + ".time_emb.1.weight"],
                        sd[key + ".time_emb.1.bias"])
        h = h + temb[:, :, None, None]
        h = conv(F.silu(gn(h, key + ".conv2.0", cout)), key + ".conv2.2")
        if cin != cout:
            x = F.conv2d(x, sd[key + ".shortcut.weight"],
                         sd[key + ".shortcut.bias"])
        return h + x

    def attn(x, key, c):
        B, _, H, W = x.shape
        qkv = F.conv2d(gn(x, key + ".norm", c), sd[key + ".qkv.weight"])
        q, k, v = qkv.reshape(B * heads, -1, H * W).chunk(3, dim=1)
        scale = 1.0 / math.sqrt(math.sqrt(c // heads))
        a = torch.einsum("bct,bcs->bts", q * scale, k * scale).softmax(dim=-1)
        o = torch.einsum("bts,bcs->bct", a, v).reshape(B, -1, H, W)
        return F.conv2d(o, sd[key + ".proj.weight"], sd[key + ".proj.bias"]) + x

    # sinusoidal embedding, cos-then-sin (reference model.py:14-32)
    half = model.model_channels // 2
    freqs = torch.exp(-math.log(10000) * torch.arange(half) / half).float()
    args = timesteps.float()[:, None] * freqs[None]
    emb = torch.cat([torch.cos(args), torch.sin(args)], dim=-1)
    if model.model_channels % 2:
        emb = torch.cat([emb, torch.zeros_like(emb[:, :1])], dim=-1)
    emb = F.linear(emb, sd["time_embed.0.weight"], sd["time_embed.0.bias"])
    emb = F.linear(F.silu(emb), sd["time_embed.2.weight"],
                   sd["time_embed.2.bias"])

    h, hs = x_nchw, []
    for di, entry in enumerate(down_plan):
        if entry[0] == "stem":
            h = conv(h, f"down_blocks.{di}.0")
        elif entry[0] == "res":
            _, cin, cout, has_attn = entry
            h = res(h, emb, f"down_blocks.{di}.0", cin, cout)
            if has_attn:
                h = attn(h, f"down_blocks.{di}.1", cout)
        else:
            h = conv(h, f"down_blocks.{di}.0.op", stride=2)
        hs.append(h)
    h = res(h, emb, "middle_block.0", middle_ch, middle_ch)
    h = attn(h, "middle_block.1", middle_ch)
    h = res(h, emb, "middle_block.2", middle_ch, middle_ch)
    h_ = hs.pop()
    for ui, entry in enumerate(up_plan):
        _, cin, cout, has_attn, upsample = entry
        cat = torch.cat([h, h_], dim=1)
        if hs:
            h_ = hs.pop()
        size = (h_.shape[-2], h_.shape[-1])
        h = res(cat, emb, f"up_blocks.{ui}.0", cin, cout)
        j = 1
        if has_attn:
            h = attn(h, f"up_blocks.{ui}.{j}", cout)
            j += 1
        if upsample:
            h = F.interpolate(h, size=size, mode="nearest")
            h = conv(h, f"up_blocks.{ui}.{j}.conv")
    return conv(F.silu(gn(h, "out.0", final_ch)), "out.2")


def _random_torch_sd(model: UNetModel, seed=0):
    """Random state_dict with the reference's key names/shapes, built by
    exporting a fresh Flax init (shapes therefore match by construction)."""
    rng = jax.random.PRNGKey(seed)
    x = jnp.zeros((1, 24, 20, model.in_channels), jnp.float32)
    variables = model.init(rng, x, jnp.zeros((1,), jnp.int32))
    g = np.random.default_rng(seed)
    sd = {k: g.normal(0, 0.08, v.shape).astype(np.float32)
          for k, v in export_state_dict(model, variables).items()}
    return sd, variables


IMG_LIKE = dict(in_channels=1, model_channels=16, out_channels=1,
                num_res_blocks=2, attention_resolutions=(2,),
                channel_mult=(1, 1, 2), num_heads=4)
# fractional stem multipliers like the sinogram model
# (Config/Mayo-Config channel_mult_proj=[1/16,1/8,...])
PROJ_LIKE = dict(in_channels=1, model_channels=16, out_channels=1,
                 num_res_blocks=1, attention_resolutions=(2, 4),
                 channel_mult=(0.25, 0.5, 1, 2), num_heads=2)


@pytest.mark.parametrize("cfg", [IMG_LIKE, PROJ_LIKE],
                         ids=["img-like", "proj-like-fractional"])
@pytest.mark.slow
def test_forward_parity_with_torch_oracle(cfg):
    model = UNetModel(**cfg)
    sd, _ = _random_torch_sd(model)
    variables = import_state_dict(model, sd)

    x = np.random.default_rng(1).normal(0, 1, (2, 25, 22, cfg["in_channels"])
                                        ).astype(np.float32)
    t = np.array([3, 40], np.int64)

    y_flax = np.asarray(model.apply(variables, jnp.asarray(x),
                                    jnp.asarray(t.astype(np.int32))))
    y_torch = _torch_oracle(model, sd,
                            torch.from_numpy(x.transpose(0, 3, 1, 2)),
                            torch.from_numpy(t))
    y_torch = y_torch.numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(y_flax, y_torch, atol=2e-4, rtol=1e-3)


def test_roundtrip_bit_exact():
    model = UNetModel(**PROJ_LIKE)
    sd, variables = _random_torch_sd(model, seed=7)
    imported = import_state_dict(model, sd)
    sd2 = export_state_dict(model, imported)
    assert set(sd2) == set(sd)
    for k in sd:
        np.testing.assert_array_equal(sd[k], sd2[k])


def test_strict_key_checking():
    model = UNetModel(**IMG_LIKE)
    sd, _ = _random_torch_sd(model)
    extra = dict(sd, **{"bogus.weight": np.zeros((1,), np.float32)})
    with pytest.raises(KeyError):
        import_state_dict(model, extra, strict=True)
    missing = dict(sd)
    missing.pop(sorted(missing)[0])
    with pytest.raises(KeyError):
        import_state_dict(model, missing)


def test_ddp_prefix_and_file_io(tmp_path):
    model = UNetModel(**IMG_LIKE)
    sd, _ = _random_torch_sd(model, seed=3)
    # DDP-style checkpoint: 'module.' prefix on every key (loggerx.py:131-140)
    ddp = {f"module.{k}": torch.from_numpy(v) for k, v in sd.items()}
    path = tmp_path / "img_model-10"
    torch.save(ddp, str(path))
    variables = load_torch_checkpoint(model, str(path))
    back = export_state_dict(model, variables)
    np.testing.assert_array_equal(back["out.2.weight"], sd["out.2.weight"])

    out2 = tmp_path / "export.pt"
    save_torch_checkpoint(model, variables, str(out2))
    reload = torch.load(str(out2), map_location="cpu")
    assert set(reload) == set(sd)


def test_key_map_covers_every_flax_param():
    model = UNetModel(**PROJ_LIKE)
    rng = jax.random.PRNGKey(0)
    x = jnp.zeros((1, 24, 20, 1), jnp.float32)
    variables = model.init(rng, x, jnp.zeros((1,), jnp.int32))
    flat = jax.tree_util.tree_flatten_with_path(variables["params"])[0]
    flax_paths = {tuple(getattr(p, "key", getattr(p, "name", None))
                        for p in path) for path, _ in flat}
    mapped = {fpath for fpath, _, _ in key_map(model)}
    assert mapped == flax_paths


@pytest.mark.slow
def test_engine_loads_reference_torch_checkpoint(tmp_path):
    """End-to-end: a reference-layout torch file at
    load_img_model_path/img_model-{epoch} loads through the orchestrator."""
    from tests.test_engine import _tiny_img_opt
    from ipdm_tpu.engine.denoiser import ProgressiveDomainDenoiser

    opt = _tiny_img_opt(tmp_path, "test_img")
    eng = ProgressiveDomainDenoiser(opt, result_save_path=str(tmp_path / "o"))
    sd = export_state_dict(eng.img_model, eng.img_params)
    sd = {k: torch.from_numpy(v * 0 + 0.25) for k, v in sd.items()}
    ckdir = tmp_path / "refck"
    ckdir.mkdir()
    torch.save(sd, str(ckdir / "img_model-5"))

    opt2 = _tiny_img_opt(tmp_path, "test_img", resume_epochs_img=5,
                         load_img_model_path=str(ckdir))
    eng2 = ProgressiveDomainDenoiser(opt2, result_save_path=str(tmp_path / "o2"))
    leaf = eng2.img_params["params"]["out_conv"]["bias"]
    np.testing.assert_allclose(np.asarray(leaf), 0.25)
