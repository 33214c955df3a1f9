"""Convert the released Sapiens TorchScript encoder to flax weights.

Usage (on a machine where the TorchScript artifact loads):
  python tools/convert_sapiens.py sapiens_1b_*.pt2 sapiens_1b_flax.npz

The reference consumes Sapiens-1B as a frozen TorchScript blob
(reference: src/models/image_feature.py:122-126). This framework
re-implements the ViT in flax (models/image_encoder.py); this tool walks the
TorchScript state dict and emits the flat .npz that
`load_sapiens_weights` (below) overlays onto the module tree.

Name mapping assumptions (standard mmpretrain/timm ViT layout — verify
against the artifact with --list and adjust NAME_RULES if the release
differs):
  patch_embed.projection.{weight,bias}   -> vit/patch_embed/{kernel,bias}
  pos_embed                               -> vit/pos_embed
  layers.N.ln1.{weight,bias}              -> vit/block_N/ln1/{scale,bias}
  layers.N.attn.qkv.{weight,bias}         -> vit/block_N/attn/{query,key,value}
  layers.N.attn.proj.{weight,bias}        -> vit/block_N/attn/out
  layers.N.ln2.{weight,bias}              -> vit/block_N/ln2/{scale,bias}
  layers.N.ffn.layers.0.0.{weight,bias}   -> vit/block_N/mlp1
  layers.N.ffn.layers.1.{weight,bias}     -> vit/block_N/mlp2
  ln1/norm1 etc. aliases are tried in order.
"""

from __future__ import annotations

import argparse
import re
import sys

import numpy as np


def load_torchscript_state(path: str) -> dict:
    import torch
    model = torch.jit.load(path, map_location="cpu")
    return {k: v.detach().numpy() for k, v in model.state_dict().items()}


def convert(sd: dict, heads: int) -> dict:
    out = {}
    taken = set()

    def grab(*names):
        for n in names:
            for k in sd:
                if k.endswith(n) and k not in taken:
                    taken.add(k)
                    return sd[k]
        return None

    w = grab("patch_embed.projection.weight", "patch_embed.proj.weight")
    if w is not None:  # (C_out, 3, p, p) -> (p, p, 3, C_out)
        out["vit/patch_embed/kernel"] = w.transpose(2, 3, 1, 0)
        out["vit/patch_embed/bias"] = grab("patch_embed.projection.bias",
                                           "patch_embed.proj.bias")
    pe = grab("pos_embed")
    if pe is not None:
        # drop cls token slot if present (S+1 vs S)
        if pe.shape[1] % 2 == 1:
            pe = pe[:, 1:]
        out["vit/pos_embed"] = pe

    layer_ids = sorted({int(m.group(1)) for k in sd
                        for m in [re.search(r"(?:layers|blocks)\.(\d+)\.", k)]
                        if m})
    for i in layer_ids:
        pre = None
        for cand in (f"layers.{i}.", f"blocks.{i}."):
            if any(k.startswith(cand) or f".{cand}" in k for k in sd):
                pre = cand
                break
        if pre is None:
            continue

        def g(*suffixes):
            return grab(*[pre + s for s in suffixes])

        b = f"vit/block_{i}"
        for src, dst in [(("ln1.weight", "norm1.weight"), f"{b}/ln1/scale"),
                         (("ln1.bias", "norm1.bias"), f"{b}/ln1/bias"),
                         (("ln2.weight", "norm2.weight"), f"{b}/ln2/scale"),
                         (("ln2.bias", "norm2.bias"), f"{b}/ln2/bias")]:
            v = g(*src)
            if v is not None:
                out[dst] = v
        qkv_w = g("attn.qkv.weight")
        if qkv_w is not None:
            D = qkv_w.shape[1]
            hd = D // heads
            qw, kw, vw = np.split(qkv_w, 3, axis=0)  # each (D, D)

            def mk(wm):  # torch (out,in) -> flax MHA (in, heads, hd)
                return wm.T.reshape(D, heads, hd)

            qkv_b = g("attn.qkv.bias")
            qb, kb, vb = (np.split(qkv_b, 3) if qkv_b is not None
                          else (None, None, None))
            for nm, wm, bm in [("query", qw, qb), ("key", kw, kb),
                               ("value", vw, vb)]:
                out[f"{b}/attn/{nm}/kernel"] = mk(wm)
                if bm is not None:
                    out[f"{b}/attn/{nm}/bias"] = bm.reshape(heads, hd)
        pw = g("attn.proj.weight")
        if pw is not None:
            D = pw.shape[0]
            hd = D // heads
            out[f"{b}/attn/out/kernel"] = pw.T.reshape(heads, hd, D)
            pb = g("attn.proj.bias")
            if pb is not None:
                out[f"{b}/attn/out/bias"] = pb
        for src, dst in [(("ffn.layers.0.0.weight", "mlp.fc1.weight"),
                          f"{b}/mlp1/kernel"),
                         (("ffn.layers.0.0.bias", "mlp.fc1.bias"),
                          f"{b}/mlp1/bias"),
                         (("ffn.layers.1.weight", "mlp.fc2.weight"),
                          f"{b}/mlp2/kernel"),
                         (("ffn.layers.1.bias", "mlp.fc2.bias"),
                          f"{b}/mlp2/bias")]:
            v = g(*src)
            if v is not None:
                out[dst] = v.T if dst.endswith("kernel") else v
    final = grab("ln1.weight", "norm.weight", "ln_final.weight")
    if final is not None:
        out["vit/ln_final/scale"] = final
        out["vit/ln_final/bias"] = grab("ln1.bias", "norm.bias", "ln_final.bias")
    return out


def load_sapiens_weights(variables: dict, npz_path: str) -> dict:
    """Overlay a converted .npz onto SapiensEncoder variables. Strips flax
    logical-partitioning boxes (TP annotations) first — the returned tree
    is plain arrays."""
    import flax
    import flax.linen as nn
    import jax.numpy as jnp
    variables = nn.meta.unbox(variables)
    flat = dict(np.load(npz_path))
    tree = flax.traverse_util.flatten_dict(variables["params"], sep="/")
    loaded = 0
    for k, v in flat.items():
        if k in tree and tree[k].shape == v.shape:
            tree[k] = jnp.asarray(v)
            loaded += 1
    print(f"[sapiens] loaded {loaded}/{len(flat)} tensors")
    return {"params": flax.traverse_util.unflatten_dict(tree, sep="/")}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("src")
    ap.add_argument("dst")
    ap.add_argument("--heads", type=int, default=24)
    ap.add_argument("--list", action="store_true",
                    help="print the torchscript tensor names and exit")
    args = ap.parse_args()
    sd = load_torchscript_state(args.src)
    if args.list:
        for k, v in sd.items():
            print(k, tuple(v.shape))
        return
    out = convert(sd, args.heads)
    np.savez(args.dst, **out)
    print(f"wrote {len(out)} tensors -> {args.dst}")


if __name__ == "__main__":
    main()
