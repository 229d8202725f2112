"""Import / export reference PyTorch UNet checkpoints ↔ Flax params.

The reference trains its DDPMs with torch and saves raw ``state_dict`` files
via ``LoggerX.checkpoints`` (reference Utils/loggerx.py:62-69) under
``save_models/{img_model,proj_model}-{epoch}``. A user switching to this
framework brings those files along; this module converts them losslessly into
the param tree of :class:`ipdm_tpu.models.unet.UNetModel` (and back).

Key-name layout of the reference model (reference Model/model.py:190-281):

* ``time_embed.{0,2}.{weight,bias}``      — the two Linear layers of the MLP
* ``down_blocks.0.0.{weight,bias}``       — stem 3×3 conv
* ``down_blocks.{i}.0.*``                 — ResidualBlock (``conv1.0`` GN,
  ``conv1.2`` conv, ``time_emb.1`` linear, ``conv2.0`` GN, ``conv2.2`` conv,
  ``shortcut`` 1×1 conv when in≠out channels)
* ``down_blocks.{i}.1.*``                 — AttentionBlock (``norm``,
  ``qkv`` — bias-free, ``proj``) where ds ∈ attention_resolutions
* ``down_blocks.{i}.0.op.*``              — Downsample stride-2 conv
* ``middle_block.{0,1,2}.*``              — res / attn / res
* ``up_blocks.{i}.{0,1,2}.*``             — res [, attn][, upsample ``conv``]
* ``out.{0,2}.{weight,bias}``             — final GN + conv

Tensor-layout transforms: torch Conv2d kernels are OIHW → Flax HWIO
(``transpose(2,3,1,0)``); torch Linear weights are [out,in] → Flax kernels
[in,out] (``T``); GroupNorm ``weight``/``bias`` → ``scale``/``bias``.
The attention qkv channel layout (head-major, q|k|v within each head) is
identical between the reference's ``chunk`` (model.py:147) and our per-head
``split``, so no channel permutation is needed.

Checkpoints saved by DDP runs carry a ``module.`` key prefix; it is stripped
(mirrors reference Utils/loggerx.py:131-140).
"""

from __future__ import annotations

from typing import Any, Dict, List, Tuple

import numpy as np

# (flax leaf path) <- (torch key suffix, transform tag)
# transform tags: "conv" OIHW->HWIO, "linear" [o,i]->[i,o], "copy"
_RES_MAP = [
    (("GN_0", "scale"), "conv1.0.weight", "copy"),
    (("GN_0", "bias"), "conv1.0.bias", "copy"),
    (("conv1", "kernel"), "conv1.2.weight", "conv"),
    (("conv1", "bias"), "conv1.2.bias", "copy"),
    (("time_emb", "kernel"), "time_emb.1.weight", "linear"),
    (("time_emb", "bias"), "time_emb.1.bias", "copy"),
    (("GN_1", "scale"), "conv2.0.weight", "copy"),
    (("GN_1", "bias"), "conv2.0.bias", "copy"),
    (("conv2", "kernel"), "conv2.2.weight", "conv"),
    (("conv2", "bias"), "conv2.2.bias", "copy"),
]
_RES_SHORTCUT = [
    (("shortcut", "kernel"), "shortcut.weight", "conv"),
    (("shortcut", "bias"), "shortcut.bias", "copy"),
]
_ATTN_MAP = [
    (("GN_0", "scale"), "norm.weight", "copy"),
    (("GN_0", "bias"), "norm.bias", "copy"),
    (("qkv", "kernel"), "qkv.weight", "conv"),
    (("proj", "kernel"), "proj.weight", "conv"),
    (("proj", "bias"), "proj.bias", "copy"),
]


def key_map(model) -> List[Tuple[Tuple[str, ...], str, str]]:
    """[(flax_path, torch_key, transform)] for every parameter of `model`
    (an ipdm_tpu UNetModel). Derived from the same static plan that builds
    the module, so the two stay in lockstep."""
    down_plan, _middle_ch, up_plan, _final_ch = model.plan()
    out: List[Tuple[Tuple[str, ...], str, str]] = []

    def add(prefix: Tuple[str, ...], tkey_prefix: str,
            table: List[Tuple[Tuple[str, ...], str, str]]):
        for fpath, tsuf, tf in table:
            out.append((prefix + fpath, f"{tkey_prefix}.{tsuf}", tf))

    def add_res(prefix: Tuple[str, ...], tkey: str, in_ch: int, out_ch: int):
        add(prefix, tkey, _RES_MAP)
        if in_ch != out_ch:
            add(prefix, tkey, _RES_SHORTCUT)

    out.append((("time_dense1", "kernel"), "time_embed.0.weight", "linear"))
    out.append((("time_dense1", "bias"), "time_embed.0.bias", "copy"))
    out.append((("time_dense2", "kernel"), "time_embed.2.weight", "linear"))
    out.append((("time_dense2", "bias"), "time_embed.2.bias", "copy"))

    for di, entry in enumerate(down_plan):
        if entry[0] == "stem":
            out.append(((f"down{di}_stem", "kernel"),
                        f"down_blocks.{di}.0.weight", "conv"))
            out.append(((f"down{di}_stem", "bias"),
                        f"down_blocks.{di}.0.bias", "copy"))
        elif entry[0] == "res":
            _, in_ch, out_ch, attn = entry
            add_res((f"down{di}_res",), f"down_blocks.{di}.0", in_ch, out_ch)
            if attn:
                add((f"down{di}_attn",), f"down_blocks.{di}.1", _ATTN_MAP)
        else:  # down
            out.append(((f"down{di}_ds", "op", "kernel"),
                        f"down_blocks.{di}.0.op.weight", "conv"))
            out.append(((f"down{di}_ds", "op", "bias"),
                        f"down_blocks.{di}.0.op.bias", "copy"))

    # middle res blocks never change channel count → never have a shortcut
    add_res(("mid_res1",), "middle_block.0", _middle_ch, _middle_ch)
    add(("mid_attn",), "middle_block.1", _ATTN_MAP)
    add_res(("mid_res2",), "middle_block.2", _middle_ch, _middle_ch)

    for ui, entry in enumerate(up_plan):
        _, in_ch, out_ch, attn, upsample = entry
        add_res((f"up{ui}_res",), f"up_blocks.{ui}.0", in_ch, out_ch)
        j = 1
        if attn:
            add((f"up{ui}_attn",), f"up_blocks.{ui}.{j}", _ATTN_MAP)
            j += 1
        if upsample:
            out.append(((f"up{ui}_us", "conv", "kernel"),
                        f"up_blocks.{ui}.{j}.conv.weight", "conv"))
            out.append(((f"up{ui}_us", "conv", "bias"),
                        f"up_blocks.{ui}.{j}.conv.bias", "copy"))

    out.append((("GN_0", "scale"), "out.0.weight", "copy"))
    out.append((("GN_0", "bias"), "out.0.bias", "copy"))
    out.append((("out_conv", "kernel"), "out.2.weight", "conv"))
    out.append((("out_conv", "bias"), "out.2.bias", "copy"))
    return out


def _to_flax(arr: np.ndarray, tf: str) -> np.ndarray:
    if tf == "conv":
        return np.ascontiguousarray(arr.transpose(2, 3, 1, 0))
    if tf == "linear":
        return np.ascontiguousarray(arr.T)
    return np.asarray(arr)


def _to_torch(arr: np.ndarray, tf: str) -> np.ndarray:
    if tf == "conv":
        return np.ascontiguousarray(arr.transpose(3, 2, 0, 1))
    if tf == "linear":
        return np.ascontiguousarray(arr.T)
    return np.asarray(arr)


def _strip_module_prefix(sd: Dict[str, Any]) -> Dict[str, Any]:
    """DDP checkpoints prefix every key with 'module.'
    (reference Utils/loggerx.py:131-140)."""
    if sd and all(k.startswith("module.") for k in sd):
        return {k[len("module."):]: v for k, v in sd.items()}
    return sd


def _as_numpy(v) -> np.ndarray:
    if hasattr(v, "detach"):  # torch tensor without importing torch
        v = v.detach().cpu().numpy()
    return np.asarray(v, dtype=np.float32)


def import_state_dict(model, state_dict: Dict[str, Any],
                      strict: bool = True) -> Dict[str, Any]:
    """Convert a reference torch ``state_dict`` (key → tensor/ndarray) into a
    Flax variables dict ``{'params': ...}`` for `model`.

    `strict` additionally verifies the torch key set matches the architecture
    exactly (surplus or missing keys raise)."""
    sd = {k: _as_numpy(v) for k, v in
          _strip_module_prefix(dict(state_dict)).items()}
    params: Dict[str, Any] = {}
    used = set()
    for fpath, tkey, tf in key_map(model):
        if tkey not in sd:
            raise KeyError(
                f"torch checkpoint is missing '{tkey}' (for flax {fpath}); "
                f"architecture mismatch?")
        node = params
        for p in fpath[:-1]:
            node = node.setdefault(p, {})
        node[fpath[-1]] = _to_flax(sd[tkey], tf)
        used.add(tkey)
    if strict:
        surplus = sorted(set(sd) - used)
        if surplus:
            raise KeyError(f"torch checkpoint has {len(surplus)} keys the "
                           f"architecture doesn't: {surplus[:8]} ...")
    return {"params": params}


def export_state_dict(model, variables: Dict[str, Any]) -> Dict[str, np.ndarray]:
    """Inverse of :func:`import_state_dict`: Flax variables → torch-layout
    ``state_dict`` (numpy arrays; pass through ``torch.from_numpy`` to save
    a reference-loadable checkpoint)."""
    params = variables["params"] if "params" in variables else variables
    sd: Dict[str, np.ndarray] = {}
    for fpath, tkey, tf in key_map(model):
        node = params
        for p in fpath:
            if p not in node:
                raise KeyError(f"flax params missing {fpath}")
            node = node[p]
        sd[tkey] = _to_torch(np.asarray(node, dtype=np.float32), tf)
    return sd


def load_torch_checkpoint(model, path: str) -> Dict[str, Any]:
    """Load a reference ``save_models/{img,proj}_model-{epoch}`` file from
    disk into Flax variables. Requires torch (baked into this image)."""
    import torch  # local import: torch is optional at runtime

    sd = torch.load(path, map_location="cpu")
    if isinstance(sd, dict) and "state_dict" in sd and all(
            not hasattr(v, "shape") for k, v in sd.items() if k != "state_dict"):
        sd = sd["state_dict"]
    return import_state_dict(model, sd)


def save_torch_checkpoint(model, variables: Dict[str, Any], path: str) -> None:
    """Write Flax params as a torch state_dict the reference can load."""
    import torch

    sd = {k: torch.from_numpy(v) for k, v in
          export_state_dict(model, variables).items()}
    torch.save(sd, path)
