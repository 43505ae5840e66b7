"""Procedural torch re-implementation of the official `segment_anything`
forward pass, operating directly on a state dict in the OFFICIAL key naming
scheme. Test oracle for multiply_tpu/models/sam.py's `port_torch_checkpoint`:
a silent transpose/naming bug in the port makes the two forwards diverge.

Math follows the published SAM architecture (Kirillov et al. 2023) as shipped
in the official repo (image_encoder.py / prompt_encoder.py / mask_decoder.py /
transformer.py). Reference driver parity target: code/lib/model/sam_model.py.
"""

from __future__ import annotations

import math

import torch
import torch.nn.functional as F


def _ln(x, w, b, eps=1e-6):
    """LayerNorm over the last dim."""
    mu = x.mean(-1, keepdim=True)
    var = ((x - mu) ** 2).mean(-1, keepdim=True)
    return (x - mu) / torch.sqrt(var + eps) * w + b


def _ln2d(x, w, b, eps=1e-6):
    """Official LayerNorm2d: normalize the channel dim of NCHW."""
    mu = x.mean(1, keepdim=True)
    var = ((x - mu) ** 2).mean(1, keepdim=True)
    x = (x - mu) / torch.sqrt(var + eps)
    return x * w[None, :, None, None] + b[None, :, None, None]


def _lin(t, pre, x):
    return F.linear(x, t[f"{pre}.weight"], t[f"{pre}.bias"])


# ---------------------------------------------------------------------------
# image encoder (ViTDet-style with windowed + decomposed-rel-pos attention)
# ---------------------------------------------------------------------------


def _get_rel_pos(q_size, k_size, rel_pos):
    max_rel = 2 * max(q_size, k_size) - 1
    if rel_pos.shape[0] != max_rel:
        rel = F.interpolate(
            rel_pos.reshape(1, rel_pos.shape[0], -1).permute(0, 2, 1),
            size=max_rel,
            mode="linear",
        )
        rel = rel.reshape(-1, max_rel).permute(1, 0)
    else:
        rel = rel_pos
    q_coords = torch.arange(q_size)[:, None] * max(k_size / q_size, 1.0)
    k_coords = torch.arange(k_size)[None, :] * max(q_size / k_size, 1.0)
    idx = (q_coords - k_coords) + (k_size - 1) * max(q_size / k_size, 1.0)
    return rel[idx.long()]


def _attention(t, pre, x, nh):
    B, H, W, C = x.shape
    hd = C // nh
    qkv = _lin(t, f"{pre}.qkv", x.reshape(B, H * W, C))
    qkv = qkv.reshape(B, H * W, 3, nh, hd).permute(2, 0, 3, 1, 4)
    q, k, v = qkv[0], qkv[1], qkv[2]
    attn = (q * hd ** -0.5) @ k.transpose(-2, -1)

    Rh = _get_rel_pos(H, H, t[f"{pre}.rel_pos_h"])
    Rw = _get_rel_pos(W, W, t[f"{pre}.rel_pos_w"])
    r_q = q.reshape(B, nh, H, W, hd)
    rel_h = torch.einsum("bnhwc,hkc->bnhwk", r_q, Rh)
    rel_w = torch.einsum("bnhwc,wkc->bnhwk", r_q, Rw)
    attn = attn.view(B, nh, H, W, H, W) + rel_h[..., :, None] + rel_w[..., None, :]
    attn = attn.view(B, nh, H * W, H * W).softmax(-1)
    out = (attn @ v).transpose(1, 2).reshape(B, H * W, C)
    return _lin(t, f"{pre}.proj", out).reshape(B, H, W, C)


def _window_partition(x, w):
    B, H, W, C = x.shape
    pad_h = (w - H % w) % w
    pad_w = (w - W % w) % w
    x = F.pad(x, (0, 0, 0, pad_w, 0, pad_h))
    Hp, Wp = H + pad_h, W + pad_w
    x = x.view(B, Hp // w, w, Wp // w, w, C).permute(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, w, w, C), (Hp, Wp)


def _window_unpartition(x, w, pad_hw, hw):
    Hp, Wp = pad_hw
    H, W = hw
    B = x.shape[0] // (Hp // w * Wp // w)
    x = x.view(B, Hp // w, Wp // w, w, w, -1).permute(0, 1, 3, 2, 4, 5)
    return x.reshape(B, Hp, Wp, -1)[:, :H, :W]


def encode_image(t, x, cfg, window_size=14):
    """x: (B, H, W, 3) float NHWC -> (B, H/16, W/16, 256) NHWC."""
    x = x.permute(0, 3, 1, 2)
    x = F.conv2d(
        x,
        t["image_encoder.patch_embed.proj.weight"],
        t["image_encoder.patch_embed.proj.bias"],
        stride=16,
    )
    x = x.permute(0, 2, 3, 1)
    x = x + t["image_encoder.pos_embed"]
    for i in range(cfg["depth"]):
        pre = f"image_encoder.blocks.{i}"
        shortcut = x
        h = _ln(x, t[f"{pre}.norm1.weight"], t[f"{pre}.norm1.bias"])
        ws = 0 if i in cfg["global_attn"] else window_size
        if ws > 0:
            h, pad_hw = _window_partition(h, ws)
            out = _attention(t, f"{pre}.attn", h, cfg["num_heads"])
            out = _window_unpartition(out, ws, pad_hw, (x.shape[1], x.shape[2]))
        else:
            out = _attention(t, f"{pre}.attn", h, cfg["num_heads"])
        x = shortcut + out
        h = _ln(x, t[f"{pre}.norm2.weight"], t[f"{pre}.norm2.bias"])
        h = _lin(t, f"{pre}.mlp.lin1", h)
        h = F.gelu(h)
        h = _lin(t, f"{pre}.mlp.lin2", h)
        x = x + h
    x = x.permute(0, 3, 1, 2)
    x = F.conv2d(x, t["image_encoder.neck.0.weight"])
    x = _ln2d(x, t["image_encoder.neck.1.weight"], t["image_encoder.neck.1.bias"])
    x = F.conv2d(x, t["image_encoder.neck.2.weight"], padding=1)
    x = _ln2d(x, t["image_encoder.neck.3.weight"], t["image_encoder.neck.3.bias"])
    return x.permute(0, 2, 3, 1)


# ---------------------------------------------------------------------------
# prompt encoder
# ---------------------------------------------------------------------------


def _pe_encoding(t, coords):
    c = 2.0 * coords - 1.0
    c = c @ t["prompt_encoder.pe_layer.positional_encoding_gaussian_matrix"]
    c = 2.0 * math.pi * c
    return torch.cat([c.sin(), c.cos()], -1)


def dense_pe(t, grid):
    ys = (torch.arange(grid, dtype=torch.float32) + 0.5) / grid
    xs = (torch.arange(grid, dtype=torch.float32) + 0.5) / grid
    gx, gy = torch.meshgrid(xs, ys, indexing="xy")
    return _pe_encoding(t, torch.stack([gx, gy], -1))


def prompt_encode(t, points, labels, mask_input, img_size, grid):
    """points (N,2) in pixels, labels (N,), mask_input (Hm,Wm) or None."""
    pts = (points + 0.5) / img_size
    pe = _pe_encoding(t, pts)
    emb = pe.clone()
    emb[labels == -1] = t["prompt_encoder.not_a_point_embed.weight"][0]
    for lbl in range(4):
        emb[labels == lbl] += t[f"prompt_encoder.point_embeddings.{lbl}.weight"][0]

    if mask_input is not None:
        m = mask_input[None, None]
        m = F.conv2d(
            m,
            t["prompt_encoder.mask_downscaling.0.weight"],
            t["prompt_encoder.mask_downscaling.0.bias"],
            stride=2,
        )
        m = F.gelu(
            _ln2d(
                m,
                t["prompt_encoder.mask_downscaling.1.weight"],
                t["prompt_encoder.mask_downscaling.1.bias"],
            )
        )
        m = F.conv2d(
            m,
            t["prompt_encoder.mask_downscaling.3.weight"],
            t["prompt_encoder.mask_downscaling.3.bias"],
            stride=2,
        )
        m = F.gelu(
            _ln2d(
                m,
                t["prompt_encoder.mask_downscaling.4.weight"],
                t["prompt_encoder.mask_downscaling.4.bias"],
            )
        )
        m = F.conv2d(
            m,
            t["prompt_encoder.mask_downscaling.6.weight"],
            t["prompt_encoder.mask_downscaling.6.bias"],
        )
        dense = m[0].permute(1, 2, 0)  # (grid, grid, C)
    else:
        C = t["prompt_encoder.no_mask_embed.weight"].shape[1]
        dense = t["prompt_encoder.no_mask_embed.weight"][0].expand(grid, grid, C)
    return emb, dense


# ---------------------------------------------------------------------------
# two-way transformer mask decoder
# ---------------------------------------------------------------------------


def _dec_attn(t, pre, q, k, v, nh=8):
    qp = _lin(t, f"{pre}.q_proj", q)
    kp = _lin(t, f"{pre}.k_proj", k)
    vp = _lin(t, f"{pre}.v_proj", v)
    inner = qp.shape[-1]
    hd = inner // nh

    def split(x):
        return x.reshape(x.shape[0], nh, hd).transpose(0, 1)

    qh, kh, vh = split(qp), split(kp), split(vp)
    attn = ((qh / math.sqrt(hd)) @ kh.transpose(-2, -1)).softmax(-1)
    out = (attn @ vh).transpose(0, 1).reshape(-1, inner)
    return _lin(t, f"{pre}.out_proj", out)


def _twoway_block(t, pre, queries, keys, query_pe, key_pe, skip_first):
    if skip_first:
        queries = _dec_attn(t, f"{pre}.self_attn", queries, queries, queries)
    else:
        q = queries + query_pe
        queries = queries + _dec_attn(t, f"{pre}.self_attn", q, q, queries)
    queries = _ln(queries, t[f"{pre}.norm1.weight"], t[f"{pre}.norm1.bias"])

    q = queries + query_pe
    k = keys + key_pe
    queries = queries + _dec_attn(t, f"{pre}.cross_attn_token_to_image", q, k, keys)
    queries = _ln(queries, t[f"{pre}.norm2.weight"], t[f"{pre}.norm2.bias"])

    h = _lin(t, f"{pre}.mlp.lin1", queries)
    h = _lin(t, f"{pre}.mlp.lin2", F.relu(h))
    queries = _ln(queries + h, t[f"{pre}.norm3.weight"], t[f"{pre}.norm3.bias"])

    q = queries + query_pe
    k = keys + key_pe
    keys = keys + _dec_attn(t, f"{pre}.cross_attn_image_to_token", k, q, queries)
    keys = _ln(keys, t[f"{pre}.norm4.weight"], t[f"{pre}.norm4.bias"])
    return queries, keys


def mask_decode(t, image_embed, image_pe, sparse, dense, num_mask_tokens=4):
    """image_embed/image_pe/dense: (grid, grid, C) NHWC; sparse: (N, C)."""
    tokens = torch.cat(
        [t["mask_decoder.iou_token.weight"], t["mask_decoder.mask_tokens.weight"], sparse]
    )
    C = tokens.shape[-1]
    src = (image_embed + dense).reshape(-1, C)
    pos = image_pe.reshape(-1, C)

    q, k = tokens, src
    pre = "mask_decoder.transformer.layers"
    q, k = _twoway_block(t, f"{pre}.0", q, k, tokens, pos, skip_first=True)
    q, k = _twoway_block(t, f"{pre}.1", q, k, tokens, pos, skip_first=False)
    attn = _dec_attn(
        t, "mask_decoder.transformer.final_attn_token_to_image", q + tokens, k + pos, k
    )
    q = _ln(
        q + attn,
        t["mask_decoder.transformer.norm_final_attn.weight"],
        t["mask_decoder.transformer.norm_final_attn.bias"],
    )

    iou_out = q[0]
    mask_out = q[1 : 1 + num_mask_tokens]

    grid = image_embed.shape[0]
    up = k.reshape(1, grid, grid, C).permute(0, 3, 1, 2)
    up = F.conv_transpose2d(
        up,
        t["mask_decoder.output_upscaling.0.weight"],
        t["mask_decoder.output_upscaling.0.bias"],
        stride=2,
    )
    up = F.gelu(
        _ln2d(
            up,
            t["mask_decoder.output_upscaling.1.weight"],
            t["mask_decoder.output_upscaling.1.bias"],
        )
    )
    up = F.conv_transpose2d(
        up,
        t["mask_decoder.output_upscaling.3.weight"],
        t["mask_decoder.output_upscaling.3.bias"],
        stride=2,
    )
    up = F.gelu(up)[0].permute(1, 2, 0)  # (4g, 4g, C/8)

    hyper = []
    for i in range(num_mask_tokens):
        pre_h = f"mask_decoder.output_hypernetworks_mlps.{i}.layers"
        h = F.relu(_lin(t, f"{pre_h}.0", mask_out[i]))
        h = F.relu(_lin(t, f"{pre_h}.1", h))
        hyper.append(_lin(t, f"{pre_h}.2", h))
    hyper = torch.stack(hyper)
    masks = torch.einsum("mc,hwc->mhw", hyper, up)

    pre_i = "mask_decoder.iou_prediction_head.layers"
    h = F.relu(_lin(t, f"{pre_i}.0", iou_out))
    h = F.relu(_lin(t, f"{pre_i}.1", h))
    iou_pred = _lin(t, f"{pre_i}.2", h)
    return masks, iou_pred


# ---------------------------------------------------------------------------
# state-dict construction in the official naming scheme
# ---------------------------------------------------------------------------


def make_state_dict(cfg, img_size, seed=0, prompt_dim=256, window_size=14):
    """Random state dict with the official `segment_anything` key names for a
    model of the given ViT config (any embed_dim/depth)."""
    g = torch.Generator().manual_seed(seed)
    C = cfg["embed_dim"]
    nh = cfg["num_heads"]
    hd = C // nh
    grid = img_size // 16
    P = prompt_dim

    def r(*shape, scale=0.1):
        return torch.randn(*shape, generator=g) * scale

    t = {}
    t["image_encoder.patch_embed.proj.weight"] = r(C, 3, 16, 16)
    t["image_encoder.patch_embed.proj.bias"] = r(C)
    t["image_encoder.pos_embed"] = r(1, grid, grid, C)
    for i in range(cfg["depth"]):
        pre = f"image_encoder.blocks.{i}"
        size = grid if i in cfg["global_attn"] else window_size
        t[f"{pre}.norm1.weight"] = 1 + r(C)
        t[f"{pre}.norm1.bias"] = r(C)
        t[f"{pre}.norm2.weight"] = 1 + r(C)
        t[f"{pre}.norm2.bias"] = r(C)
        t[f"{pre}.attn.qkv.weight"] = r(3 * C, C)
        t[f"{pre}.attn.qkv.bias"] = r(3 * C)
        t[f"{pre}.attn.proj.weight"] = r(C, C)
        t[f"{pre}.attn.proj.bias"] = r(C)
        t[f"{pre}.attn.rel_pos_h"] = r(2 * size - 1, hd)
        t[f"{pre}.attn.rel_pos_w"] = r(2 * size - 1, hd)
        t[f"{pre}.mlp.lin1.weight"] = r(4 * C, C)
        t[f"{pre}.mlp.lin1.bias"] = r(4 * C)
        t[f"{pre}.mlp.lin2.weight"] = r(C, 4 * C)
        t[f"{pre}.mlp.lin2.bias"] = r(C)
    t["image_encoder.neck.0.weight"] = r(P, C, 1, 1)
    t["image_encoder.neck.1.weight"] = 1 + r(P)
    t["image_encoder.neck.1.bias"] = r(P)
    t["image_encoder.neck.2.weight"] = r(P, P, 3, 3)
    t["image_encoder.neck.3.weight"] = 1 + r(P)
    t["image_encoder.neck.3.bias"] = r(P)

    t["prompt_encoder.pe_layer.positional_encoding_gaussian_matrix"] = r(2, P // 2, scale=1.0)
    for i in range(4):
        t[f"prompt_encoder.point_embeddings.{i}.weight"] = r(1, P)
    t["prompt_encoder.not_a_point_embed.weight"] = r(1, P)
    t["prompt_encoder.no_mask_embed.weight"] = r(1, P)
    t["prompt_encoder.mask_downscaling.0.weight"] = r(4, 1, 2, 2)
    t["prompt_encoder.mask_downscaling.0.bias"] = r(4)
    t["prompt_encoder.mask_downscaling.1.weight"] = 1 + r(4)
    t["prompt_encoder.mask_downscaling.1.bias"] = r(4)
    t["prompt_encoder.mask_downscaling.3.weight"] = r(16, 4, 2, 2)
    t["prompt_encoder.mask_downscaling.3.bias"] = r(16)
    t["prompt_encoder.mask_downscaling.4.weight"] = 1 + r(16)
    t["prompt_encoder.mask_downscaling.4.bias"] = r(16)
    t["prompt_encoder.mask_downscaling.6.weight"] = r(P, 16, 1, 1)
    t["prompt_encoder.mask_downscaling.6.bias"] = r(P)

    t["mask_decoder.iou_token.weight"] = r(1, P)
    t["mask_decoder.mask_tokens.weight"] = r(4, P)
    for i in range(2):
        pre = f"mask_decoder.transformer.layers.{i}"
        for name, dim in [
            ("self_attn", P),
            ("cross_attn_token_to_image", P // 2),
            ("cross_attn_image_to_token", P // 2),
        ]:
            t[f"{pre}.{name}.q_proj.weight"] = r(dim, P)
            t[f"{pre}.{name}.q_proj.bias"] = r(dim)
            t[f"{pre}.{name}.k_proj.weight"] = r(dim, P)
            t[f"{pre}.{name}.k_proj.bias"] = r(dim)
            t[f"{pre}.{name}.v_proj.weight"] = r(dim, P)
            t[f"{pre}.{name}.v_proj.bias"] = r(dim)
            t[f"{pre}.{name}.out_proj.weight"] = r(P, dim)
            t[f"{pre}.{name}.out_proj.bias"] = r(P)
        for n in range(1, 5):
            t[f"{pre}.norm{n}.weight"] = 1 + r(P)
            t[f"{pre}.norm{n}.bias"] = r(P)
        t[f"{pre}.mlp.lin1.weight"] = r(2048, P)
        t[f"{pre}.mlp.lin1.bias"] = r(2048)
        t[f"{pre}.mlp.lin2.weight"] = r(P, 2048)
        t[f"{pre}.mlp.lin2.bias"] = r(P)
    pre = "mask_decoder.transformer.final_attn_token_to_image"
    t[f"{pre}.q_proj.weight"] = r(P // 2, P)
    t[f"{pre}.q_proj.bias"] = r(P // 2)
    t[f"{pre}.k_proj.weight"] = r(P // 2, P)
    t[f"{pre}.k_proj.bias"] = r(P // 2)
    t[f"{pre}.v_proj.weight"] = r(P // 2, P)
    t[f"{pre}.v_proj.bias"] = r(P // 2)
    t[f"{pre}.out_proj.weight"] = r(P, P // 2)
    t[f"{pre}.out_proj.bias"] = r(P)
    t["mask_decoder.transformer.norm_final_attn.weight"] = 1 + r(P)
    t["mask_decoder.transformer.norm_final_attn.bias"] = r(P)
    t["mask_decoder.output_upscaling.0.weight"] = r(P, P // 4, 2, 2)
    t["mask_decoder.output_upscaling.0.bias"] = r(P // 4)
    t["mask_decoder.output_upscaling.1.weight"] = 1 + r(P // 4)
    t["mask_decoder.output_upscaling.1.bias"] = r(P // 4)
    t["mask_decoder.output_upscaling.3.weight"] = r(P // 4, P // 8, 2, 2)
    t["mask_decoder.output_upscaling.3.bias"] = r(P // 8)
    for i in range(4):
        pre = f"mask_decoder.output_hypernetworks_mlps.{i}.layers"
        t[f"{pre}.0.weight"] = r(P, P)
        t[f"{pre}.0.bias"] = r(P)
        t[f"{pre}.1.weight"] = r(P, P)
        t[f"{pre}.1.bias"] = r(P)
        t[f"{pre}.2.weight"] = r(P // 8, P)
        t[f"{pre}.2.bias"] = r(P // 8)
    pre = "mask_decoder.iou_prediction_head.layers"
    t[f"{pre}.0.weight"] = r(P, P)
    t[f"{pre}.0.bias"] = r(P)
    t[f"{pre}.1.weight"] = r(P, P)
    t[f"{pre}.1.bias"] = r(P)
    t[f"{pre}.2.weight"] = r(4, P)
    t[f"{pre}.2.bias"] = r(4)
    return t
