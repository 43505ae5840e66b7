"""Segment Anything (SAM) in JAX/flax: ViT image encoder with windowed +
decomposed-relative-position attention, prompt encoder, and two-way
transformer mask decoder, plus a predictor wrapper and torch-checkpoint
weight porting.

Role in the system: the promptable-segmentation backend of the mask
self-refinement loop (reference: code/lib/model/sam_model.py drives the
official PyTorch `segment_anything` ViT-H — here the whole model runs as XLA
on the TPU; prompts and bookkeeping stay on host). Architecture follows the
published SAM design (Kirillov et al., 2023); weights load from the official
`sam_vit_h_4b8939.pth` / `sam_vit_b_01ec64.pth` checkpoints when available.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

VIT_CONFIGS = {
    "vit_b": dict(embed_dim=768, depth=12, num_heads=12, global_attn=(2, 5, 8, 11)),
    "vit_l": dict(embed_dim=1024, depth=24, num_heads=16, global_attn=(5, 11, 17, 23)),
    "vit_h": dict(embed_dim=1280, depth=32, num_heads=16, global_attn=(7, 15, 23, 31)),
    # tiny variant for tests (random weights, architecture-only checks)
    "vit_test": dict(embed_dim=32, depth=2, num_heads=2, global_attn=(1,)),
    # vit_b cross-section for production-geometry tests: full embed/head
    # width and the real 1024-input token grid, truncated to one windowed +
    # one global block (depth adds repetition, not new geometry)
    "vit_b2": dict(embed_dim=768, depth=2, num_heads=12, global_attn=(1,)),
}
IMG_SIZE = 1024
PATCH = 16
PROMPT_DIM = 256
LOW_RES = 256  # low-res mask logits side


def window_partition(x: jnp.ndarray, w: int):
    """(H, W, C) -> (num_windows, w, w, C) with padding; returns pad info."""
    H, W, C = x.shape
    pad_h = (w - H % w) % w
    pad_w = (w - W % w) % w
    x = jnp.pad(x, ((0, pad_h), (0, pad_w), (0, 0)))
    Hp, Wp = H + pad_h, W + pad_w
    x = x.reshape(Hp // w, w, Wp // w, w, C).transpose(0, 2, 1, 3, 4)
    return x.reshape(-1, w, w, C), (Hp, Wp)


def window_unpartition(x: jnp.ndarray, w: int, pad_hw, hw):
    Hp, Wp = pad_hw
    H, W = hw
    C = x.shape[-1]
    x = x.reshape(Hp // w, Wp // w, w, w, C).transpose(0, 2, 1, 3, 4)
    return x.reshape(Hp, Wp, C)[:H, :W]


def get_rel_pos(q_size: int, k_size: int, rel_pos: jnp.ndarray) -> jnp.ndarray:
    """Relative position embeddings for decomposed attention (interpolation
    skipped: q_size == k_size in all our uses)."""
    max_rel = 2 * max(q_size, k_size) - 1
    if rel_pos.shape[0] != max_rel:
        rel = jax.image.resize(rel_pos, (max_rel, rel_pos.shape[1]), "linear")
    else:
        rel = rel_pos
    q_coords = jnp.arange(q_size)[:, None] * max(k_size / q_size, 1.0)
    k_coords = jnp.arange(k_size)[None, :] * max(q_size / k_size, 1.0)
    idx = (q_coords - k_coords) + (k_size - 1) * max(q_size / k_size, 1.0)
    return rel[idx.astype(jnp.int32)]


class ViTAttention(nn.Module):
    dim: int
    num_heads: int
    use_rel_pos: bool = True
    input_size: tuple[int, int] = (14, 14)

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:  # (B, H, W, C)
        B, H, W, C = x.shape
        nh = self.num_heads
        hd = self.dim // nh
        qkv = nn.Dense(self.dim * 3, name="qkv")(x.reshape(B, H * W, C))
        qkv = qkv.reshape(B, H * W, 3, nh, hd).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]  # (B, nh, HW, hd)

        attn = (q * (hd**-0.5)) @ k.transpose(0, 1, 3, 2)

        if self.use_rel_pos:
            rel_h = self.param(
                "rel_pos_h", nn.initializers.zeros, (2 * self.input_size[0] - 1, hd)
            )
            rel_w = self.param(
                "rel_pos_w", nn.initializers.zeros, (2 * self.input_size[1] - 1, hd)
            )
            Rh = get_rel_pos(H, H, rel_h)  # (H, H, hd)
            Rw = get_rel_pos(W, W, rel_w)
            r_q = q.reshape(B, nh, H, W, hd)
            rel_h_term = jnp.einsum("bnhwc,hkc->bnhwk", r_q, Rh)
            rel_w_term = jnp.einsum("bnhwc,wkc->bnhwk", r_q, Rw)
            attn = attn.reshape(B, nh, H, W, H, W)
            attn = attn + rel_h_term[..., :, None] + rel_w_term[..., None, :]
            attn = attn.reshape(B, nh, H * W, H * W)

        attn = jax.nn.softmax(attn, axis=-1)
        out = (attn @ v).transpose(0, 2, 1, 3).reshape(B, H * W, self.dim)
        out = nn.Dense(self.dim, name="proj")(out)
        return out.reshape(B, H, W, self.dim)


class ViTBlock(nn.Module):
    dim: int
    num_heads: int
    window_size: int = 14  # 0 = global attention
    input_size: tuple[int, int] = (64, 64)

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:  # (B, H, W, C)
        shortcut = x
        h = nn.LayerNorm(epsilon=1e-6, name="norm1")(x)
        if self.window_size > 0:
            B = h.shape[0]
            windows, pad_hw = jax.vmap(
                lambda img: window_partition(img, self.window_size)
            )(h)
            nw = windows.shape[1]
            wsz = self.window_size
            attn_in = windows.reshape(B * nw, wsz, wsz, self.dim)
            attn_size = (wsz, wsz)
        else:
            attn_in = h
            attn_size = self.input_size

        attn_out = ViTAttention(
            self.dim, self.num_heads, input_size=attn_size, name="attn"
        )(attn_in)

        if self.window_size > 0:
            B = x.shape[0]
            wsz = self.window_size
            H, W = x.shape[1], x.shape[2]
            pad_h = (wsz - H % wsz) % wsz
            pad_w = (wsz - W % wsz) % wsz
            attn_out = attn_out.reshape(B, -1, wsz, wsz, self.dim)
            attn_out = jax.vmap(
                lambda wnd: window_unpartition(wnd, wsz, (H + pad_h, W + pad_w), (H, W))
            )(attn_out)

        x = shortcut + attn_out
        h = nn.LayerNorm(epsilon=1e-6, name="norm2")(x)
        h = nn.Dense(self.dim * 4, name="mlp_lin1")(h)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(self.dim, name="mlp_lin2")(h)
        return x + h


class LayerNorm2d(nn.Module):
    channels: int
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:  # (..., H, W, C)
        w = self.param("weight", nn.initializers.ones, (self.channels,))
        b = self.param("bias", nn.initializers.zeros, (self.channels,))
        mu = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.mean((x - mu) ** 2, axis=-1, keepdims=True)
        return (x - mu) / jnp.sqrt(var + self.eps) * w + b


class ImageEncoderViT(nn.Module):
    embed_dim: int = 1280
    depth: int = 32
    num_heads: int = 16
    global_attn: Sequence[int] = (7, 15, 23, 31)
    window_size: int = 14
    out_chans: int = PROMPT_DIM

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:  # (B,1024,1024,3) -> (B,64,64,256)
        x = nn.Conv(
            self.embed_dim, (PATCH, PATCH), strides=(PATCH, PATCH),
            padding="VALID", name="patch_embed",
        )(x)
        pos = self.param(
            "pos_embed",
            nn.initializers.zeros,
            (1, IMG_SIZE // PATCH, IMG_SIZE // PATCH, self.embed_dim),
        )
        x = x + pos
        grid = (IMG_SIZE // PATCH, IMG_SIZE // PATCH)
        for i in range(self.depth):
            x = ViTBlock(
                self.embed_dim,
                self.num_heads,
                window_size=0 if i in self.global_attn else self.window_size,
                input_size=grid,
                name=f"block{i}",
            )(x)
        x = nn.Conv(self.out_chans, (1, 1), use_bias=False, name="neck_conv1")(x)
        x = LayerNorm2d(self.out_chans, name="neck_ln1")(x)
        x = nn.Conv(self.out_chans, (3, 3), padding="SAME", use_bias=False, name="neck_conv2")(x)
        x = LayerNorm2d(self.out_chans, name="neck_ln2")(x)
        return x


class PromptEncoder(nn.Module):
    embed_dim: int = PROMPT_DIM

    def setup(self):
        self.pe_gaussian = self.param(
            "pe_gaussian", nn.initializers.normal(1.0), (2, self.embed_dim // 2)
        )
        # 0: neg point, 1: pos point, 2: box top-left, 3: box bottom-right
        self.point_embeddings = self.param(
            "point_embeddings", nn.initializers.normal(1.0), (4, self.embed_dim)
        )
        self.not_a_point = self.param(
            "not_a_point", nn.initializers.normal(1.0), (self.embed_dim,)
        )
        self.no_mask = self.param(
            "no_mask", nn.initializers.normal(1.0), (self.embed_dim,)
        )
        self.mask_conv1 = nn.Conv(4, (2, 2), strides=(2, 2), name="mask_conv1")
        self.mask_ln1 = LayerNorm2d(4, name="mask_ln1")
        self.mask_conv2 = nn.Conv(16, (2, 2), strides=(2, 2), name="mask_conv2")
        self.mask_ln2 = LayerNorm2d(16, name="mask_ln2")
        self.mask_conv3 = nn.Conv(self.embed_dim, (1, 1), name="mask_conv3")

    def _pe(self, coords: jnp.ndarray) -> jnp.ndarray:
        """Random-fourier positional encoding of [0,1] coords (..., 2)."""
        c = 2.0 * coords - 1.0
        c = c @ self.pe_gaussian
        c = 2.0 * jnp.pi * c
        return jnp.concatenate([jnp.sin(c), jnp.cos(c)], axis=-1)

    def dense_pe(self, grid: int | None = None) -> jnp.ndarray:
        if grid is None:
            grid = IMG_SIZE // PATCH
        ys = (jnp.arange(grid) + 0.5) / grid
        xs = (jnp.arange(grid) + 0.5) / grid
        g = jnp.stack(jnp.meshgrid(xs, ys, indexing="xy"), axis=-1)
        return self._pe(g)  # (grid, grid, C)

    def __call__(
        self,
        points: jnp.ndarray,  # (N, 2) pixel coords in [0, IMG_SIZE]
        labels: jnp.ndarray,  # (N,) 1 pos / 0 neg / -1 pad / 2,3 box corners
        mask_input: jnp.ndarray | None,  # (256, 256) logits or None
    ):
        pts = (points + 0.5) / IMG_SIZE
        pe = self._pe(pts)
        emb = jnp.where(
            (labels == -1)[:, None], self.not_a_point[None] + 0.0 * pe, pe
        )
        for lbl in range(4):
            emb = jnp.where(
                (labels == lbl)[:, None], pe + self.point_embeddings[lbl][None], emb
            )
        # padding points zero the PE term entirely (official behavior)
        emb = jnp.where((labels == -1)[:, None], self.not_a_point[None], emb)

        if mask_input is not None:
            m = mask_input[None, :, :, None]  # (1, 256, 256, 1)
            m = self.mask_conv1(m)
            m = jax.nn.gelu(self.mask_ln1(m), approximate=False)
            m = self.mask_conv2(m)
            m = jax.nn.gelu(self.mask_ln2(m), approximate=False)
            dense = self.mask_conv3(m)[0]  # (64, 64, C)
        else:
            dense = jnp.broadcast_to(
                self.no_mask, (IMG_SIZE // PATCH, IMG_SIZE // PATCH, self.embed_dim)
            )
        return emb, dense


class DecoderAttention(nn.Module):
    dim: int
    num_heads: int
    downsample: int = 1

    @nn.compact
    def __call__(self, q, k, v):
        inner = self.dim // self.downsample
        hd = inner // self.num_heads
        qp = nn.Dense(inner, name="q_proj")(q)
        kp = nn.Dense(inner, name="k_proj")(k)
        vp = nn.Dense(inner, name="v_proj")(v)

        def split(x):
            return x.reshape(x.shape[0], self.num_heads, hd).transpose(1, 0, 2)

        qh, kh, vh = split(qp), split(kp), split(vp)
        attn = jax.nn.softmax((qh * hd**-0.5) @ kh.transpose(0, 2, 1), axis=-1)
        out = (attn @ vh).transpose(1, 0, 2).reshape(q.shape[0], inner)
        return nn.Dense(self.dim, name="out_proj")(out)


class TwoWayBlock(nn.Module):
    dim: int = PROMPT_DIM
    num_heads: int = 8
    mlp_dim: int = 2048
    skip_first_pe: bool = False

    @nn.compact
    def __call__(self, queries, keys, query_pe, key_pe):
        if self.skip_first_pe:
            # official TwoWayAttentionBlock: the first layer REPLACES queries
            # with the self-attention output (no residual add)
            queries = DecoderAttention(self.dim, self.num_heads, name="self_attn")(
                queries, queries, queries
            )
        else:
            q = queries + query_pe
            attn = DecoderAttention(self.dim, self.num_heads, name="self_attn")(
                q, q, queries
            )
            queries = queries + attn
        queries = nn.LayerNorm(name="norm1")(queries)

        q = queries + query_pe
        k = keys + key_pe
        attn = DecoderAttention(self.dim, self.num_heads, 2, name="cross_t2i")(q, k, keys)
        queries = nn.LayerNorm(name="norm2")(queries + attn)

        h = nn.Dense(self.mlp_dim, name="mlp_lin1")(queries)
        h = nn.Dense(self.dim, name="mlp_lin2")(nn.relu(h))
        queries = nn.LayerNorm(name="norm3")(queries + h)

        q = queries + query_pe
        k = keys + key_pe
        attn = DecoderAttention(self.dim, self.num_heads, 2, name="cross_i2t")(k, q, queries)
        keys = nn.LayerNorm(name="norm4")(keys + attn)
        return queries, keys


class MaskDecoder(nn.Module):
    dim: int = PROMPT_DIM
    num_mask_tokens: int = 4

    @nn.compact
    def __call__(
        self,
        image_embed: jnp.ndarray,  # (64, 64, C)
        image_pe: jnp.ndarray,  # (64, 64, C)
        sparse_prompt: jnp.ndarray,  # (N, C)
        dense_prompt: jnp.ndarray,  # (64, 64, C)
    ):
        iou_token = self.param("iou_token", nn.initializers.normal(1.0), (1, self.dim))
        mask_tokens = self.param(
            "mask_tokens", nn.initializers.normal(1.0), (self.num_mask_tokens, self.dim)
        )
        tokens = jnp.concatenate([iou_token, mask_tokens, sparse_prompt], axis=0)

        g = image_embed.shape[0]  # embedding grid side
        src = (image_embed + dense_prompt).reshape(-1, self.dim)
        pos = image_pe.reshape(-1, self.dim)

        q, k = tokens, src
        q, k = TwoWayBlock(self.dim, skip_first_pe=True, name="block0")(q, k, tokens, pos)
        q, k = TwoWayBlock(self.dim, name="block1")(q, k, tokens, pos)
        attn = DecoderAttention(self.dim, 8, 2, name="final_t2i")(q + tokens, k + pos, k)
        q = nn.LayerNorm(name="final_norm")(q + attn)

        iou_out = q[0]
        mask_out = q[1 : 1 + self.num_mask_tokens]

        up = k.reshape(g, g, self.dim)[None]
        up = nn.ConvTranspose(self.dim // 4, (2, 2), strides=(2, 2), name="upscale_conv1")(up)
        up = jax.nn.gelu(LayerNorm2d(self.dim // 4, name="upscale_ln")(up), approximate=False)
        up = nn.ConvTranspose(self.dim // 8, (2, 2), strides=(2, 2), name="upscale_conv2")(up)
        up = jax.nn.gelu(up, approximate=False)[0]  # (256, 256, C/8)

        hyper = []
        for i in range(self.num_mask_tokens):
            h = mask_out[i]
            h = nn.relu(nn.Dense(self.dim, name=f"hyper{i}_lin0")(h))
            h = nn.relu(nn.Dense(self.dim, name=f"hyper{i}_lin1")(h))
            h = nn.Dense(self.dim // 8, name=f"hyper{i}_lin2")(h)
            hyper.append(h)
        hyper = jnp.stack(hyper, axis=0)  # (4, C/8)
        masks = jnp.einsum("mc,hwc->mhw", hyper, up)  # (4, 256, 256)

        h = nn.relu(nn.Dense(self.dim, name="iou_lin0")(iou_out))
        h = nn.relu(nn.Dense(self.dim, name="iou_lin1")(h))
        iou_pred = nn.Dense(self.num_mask_tokens, name="iou_lin2")(h)
        return masks, iou_pred


class Sam(nn.Module):
    variant: str = "vit_h"

    def setup(self):
        cfg = VIT_CONFIGS[self.variant]
        self.image_encoder = ImageEncoderViT(
            embed_dim=cfg["embed_dim"],
            depth=cfg["depth"],
            num_heads=cfg["num_heads"],
            global_attn=cfg["global_attn"],
        )
        self.prompt_encoder = PromptEncoder()
        self.mask_decoder = MaskDecoder()

    def encode_image(self, x):
        return self.image_encoder(x)

    def decode(self, image_embed, points, labels, mask_input):
        sparse, dense = self.prompt_encoder(points, labels, mask_input)
        image_pe = self.prompt_encoder.dense_pe(image_embed.shape[0])
        return self.mask_decoder(image_embed, image_pe, sparse, dense)

    def __call__(self, x, points, labels, mask_input):
        emb = self.encode_image(x)
        return self.decode(emb[0], points, labels, mask_input)


# ---------------------------------------------------------------------------
# Predictor wrapper (SamPredictor-equivalent host API)
# ---------------------------------------------------------------------------

PIXEL_MEAN = np.array([123.675, 116.28, 103.53], np.float32)
PIXEL_STD = np.array([58.395, 57.12, 57.375], np.float32)
MAX_POINTS = 64  # prompts padded to a fixed count for stable jit shapes


class SamPredictor:
    def __init__(self, model: Sam, params):
        self.model = model
        self.params = params
        self._embed = None
        self._scale = 1.0
        self._orig_hw = None

        self._encode = jax.jit(
            lambda p, x: self.model.apply(p, x, method=Sam.encode_image)
        )
        self._decode = jax.jit(
            lambda p, emb, pts, lbl, m: self.model.apply(
                p, emb, pts, lbl, m, method=Sam.decode
            )
        )

    def set_image(self, rgb_uint8: np.ndarray) -> None:
        import cv2

        H, W = rgb_uint8.shape[:2]
        self._orig_hw = (H, W)
        self._scale = IMG_SIZE / max(H, W)
        nh, nw = int(round(H * self._scale)), int(round(W * self._scale))
        img = cv2.resize(rgb_uint8, (nw, nh)).astype(np.float32)
        img = (img - PIXEL_MEAN) / PIXEL_STD
        padded = np.zeros((IMG_SIZE, IMG_SIZE, 3), np.float32)
        padded[:nh, :nw] = img
        self._embed = self._encode(self.params, jnp.asarray(padded[None]))[0]

    def predict(self, point_coords, point_labels, box=None, mask_input_logits=None):
        """Returns (256, 256) low-res mask logits (chainable as mask_input)."""
        pts = np.asarray(point_coords, np.float32) * self._scale
        lbl = np.asarray(point_labels, np.int32)
        if box is not None:
            corners = np.asarray(box, np.float32).reshape(2, 2) * self._scale
            pts = np.concatenate([pts, corners], axis=0)
            lbl = np.concatenate([lbl, np.asarray([2, 3], np.int32)])
        n = len(pts)
        if n > MAX_POINTS:
            pts, lbl = pts[:MAX_POINTS], lbl[:MAX_POINTS]
            n = MAX_POINTS
        pad = MAX_POINTS - n
        pts = np.pad(pts, ((0, pad), (0, 0)))
        lbl = np.pad(lbl, (0, pad), constant_values=-1)

        m = None
        if mask_input_logits is not None:
            m = np.asarray(mask_input_logits, np.float32)
            want = (IMG_SIZE // PATCH) * 4  # decoder's low-res mask side
            if m.shape != (want, want):
                import cv2

                m = cv2.resize(m, (want, want))
            m = jnp.asarray(m)
        masks, iou = self._decode(
            self.params, self._embed, jnp.asarray(pts), jnp.asarray(lbl), m
        )
        return np.asarray(masks[0])  # single-mask mode: first mask token

    def logits_to_full_res(self, low_res_logits: np.ndarray) -> np.ndarray:
        """Upscale chained low-res logits to the original image resolution."""
        import cv2

        H, W = self._orig_hw
        up = cv2.resize(low_res_logits, (IMG_SIZE, IMG_SIZE))
        nh, nw = int(round(H * self._scale)), int(round(W * self._scale))
        return cv2.resize(up[:nh, :nw], (W, H))


# ---------------------------------------------------------------------------
# torch checkpoint porting
# ---------------------------------------------------------------------------


class _TrackedDict(dict):
    """Dict recording which keys were read — surfaces port gaps at first
    contact with a real checkpoint (an unread key = a weight we silently
    dropped)."""

    def __init__(self, *a, **k):
        super().__init__(*a, **k)
        self.accessed: set = set()

    def __getitem__(self, key):
        self.accessed.add(key)
        return super().__getitem__(key)


def port_torch_checkpoint(path: str, variant: str = "vit_h", strict: bool = True) -> dict:
    """Map the official SAM torch state dict onto this flax parameter tree.

    strict=True (default) raises if any checkpoint key goes unconsumed —
    e.g. `sam_vit_h_4b8939.pth` carrying a tensor this port doesn't map.
    Contract frozen in tests/data/sam_manifests/ (consumer:
    /root/reference/code/lib/model/sam_model.py:46-55).
    """
    import torch

    sd = torch.load(path, map_location="cpu")
    t = _TrackedDict({k: v.numpy() for k, v in sd.items()})
    cfg = VIT_CONFIGS[variant]
    p: dict = {"image_encoder": {}, "prompt_encoder": {}, "mask_decoder": {}}
    enc = p["image_encoder"]

    def lin(prefix):
        return {"kernel": t[f"{prefix}.weight"].T, "bias": t[f"{prefix}.bias"]}

    def resize_rel(arr, block_idx):
        # A checkpoint fine-tuned at another input size carries rel_pos of a
        # different length; the official predictor interpolates every forward
        # (get_rel_pos). Flax params are fixed-shape, so resize ONCE here with
        # the same linear interpolation — numerically identical.
        size = 14 if block_idx not in cfg["global_attn"] else IMG_SIZE // PATCH
        want = 2 * size - 1
        if arr.shape[0] != want:
            import jax
            import jax.numpy as jnp

            arr = np.asarray(
                jax.image.resize(jnp.asarray(arr), (want, arr.shape[1]), "linear")
            )
        return arr

    enc["patch_embed"] = {
        "kernel": t["image_encoder.patch_embed.proj.weight"].transpose(2, 3, 1, 0),
        "bias": t["image_encoder.patch_embed.proj.bias"],
    }
    enc["pos_embed"] = t["image_encoder.pos_embed"]
    for i in range(cfg["depth"]):
        pre = f"image_encoder.blocks.{i}"
        enc[f"block{i}"] = {
            "norm1": {"scale": t[f"{pre}.norm1.weight"], "bias": t[f"{pre}.norm1.bias"]},
            "norm2": {"scale": t[f"{pre}.norm2.weight"], "bias": t[f"{pre}.norm2.bias"]},
            "attn": {
                "qkv": lin(f"{pre}.attn.qkv"),
                "proj": lin(f"{pre}.attn.proj"),
                "rel_pos_h": resize_rel(t[f"{pre}.attn.rel_pos_h"], i),
                "rel_pos_w": resize_rel(t[f"{pre}.attn.rel_pos_w"], i),
            },
            "mlp_lin1": lin(f"{pre}.mlp.lin1"),
            "mlp_lin2": lin(f"{pre}.mlp.lin2"),
        }
    enc["neck_conv1"] = {
        "kernel": t["image_encoder.neck.0.weight"].transpose(2, 3, 1, 0)
    }
    enc["neck_ln1"] = {
        "weight": t["image_encoder.neck.1.weight"], "bias": t["image_encoder.neck.1.bias"]
    }
    enc["neck_conv2"] = {
        "kernel": t["image_encoder.neck.2.weight"].transpose(2, 3, 1, 0)
    }
    enc["neck_ln2"] = {
        "weight": t["image_encoder.neck.3.weight"], "bias": t["image_encoder.neck.3.bias"]
    }

    pe = p["prompt_encoder"]
    pe["pe_gaussian"] = t["prompt_encoder.pe_layer.positional_encoding_gaussian_matrix"]
    pe["point_embeddings"] = np.stack(
        [t[f"prompt_encoder.point_embeddings.{i}.weight"][0] for i in range(4)]
    )
    pe["not_a_point"] = t["prompt_encoder.not_a_point_embed.weight"][0]
    pe["no_mask"] = t["prompt_encoder.no_mask_embed.weight"][0]
    pe["mask_conv1"] = {
        "kernel": t["prompt_encoder.mask_downscaling.0.weight"].transpose(2, 3, 1, 0),
        "bias": t["prompt_encoder.mask_downscaling.0.bias"],
    }
    pe["mask_ln1"] = {
        "weight": t["prompt_encoder.mask_downscaling.1.weight"],
        "bias": t["prompt_encoder.mask_downscaling.1.bias"],
    }
    pe["mask_conv2"] = {
        "kernel": t["prompt_encoder.mask_downscaling.3.weight"].transpose(2, 3, 1, 0),
        "bias": t["prompt_encoder.mask_downscaling.3.bias"],
    }
    pe["mask_ln2"] = {
        "weight": t["prompt_encoder.mask_downscaling.4.weight"],
        "bias": t["prompt_encoder.mask_downscaling.4.bias"],
    }
    pe["mask_conv3"] = {
        "kernel": t["prompt_encoder.mask_downscaling.6.weight"].transpose(2, 3, 1, 0),
        "bias": t["prompt_encoder.mask_downscaling.6.bias"],
    }

    md = p["mask_decoder"]
    md["iou_token"] = t["mask_decoder.iou_token.weight"]
    md["mask_tokens"] = t["mask_decoder.mask_tokens.weight"]

    def attn_block(prefix):
        return {
            "q_proj": lin(f"{prefix}.q_proj"),
            "k_proj": lin(f"{prefix}.k_proj"),
            "v_proj": lin(f"{prefix}.v_proj"),
            "out_proj": lin(f"{prefix}.out_proj"),
        }

    for i in range(2):
        pre = f"mask_decoder.transformer.layers.{i}"
        md[f"block{i}"] = {
            "self_attn": attn_block(f"{pre}.self_attn"),
            "cross_t2i": attn_block(f"{pre}.cross_attn_token_to_image"),
            "cross_i2t": attn_block(f"{pre}.cross_attn_image_to_token"),
            "norm1": {"scale": t[f"{pre}.norm1.weight"], "bias": t[f"{pre}.norm1.bias"]},
            "norm2": {"scale": t[f"{pre}.norm2.weight"], "bias": t[f"{pre}.norm2.bias"]},
            "norm3": {"scale": t[f"{pre}.norm3.weight"], "bias": t[f"{pre}.norm3.bias"]},
            "norm4": {"scale": t[f"{pre}.norm4.weight"], "bias": t[f"{pre}.norm4.bias"]},
            "mlp_lin1": lin(f"{pre}.mlp.lin1"),
            "mlp_lin2": lin(f"{pre}.mlp.lin2"),
        }
    md["final_t2i"] = attn_block("mask_decoder.transformer.final_attn_token_to_image")
    md["final_norm"] = {
        "scale": t["mask_decoder.transformer.norm_final_attn.weight"],
        "bias": t["mask_decoder.transformer.norm_final_attn.bias"],
    }
    def convT(key):
        # torch ConvTranspose2d (in,out,kh,kw) -> flax ConvTranspose
        # (kh,kw,in,out) with transpose_kernel=False, which does NOT flip the
        # kernel like torch's gradient-of-conv does — flip spatially here
        w = t[key].transpose(2, 3, 0, 1)
        return np.ascontiguousarray(w[::-1, ::-1])

    md["upscale_conv1"] = {
        "kernel": convT("mask_decoder.output_upscaling.0.weight"),
        "bias": t["mask_decoder.output_upscaling.0.bias"],
    }
    md["upscale_ln"] = {
        "weight": t["mask_decoder.output_upscaling.1.weight"],
        "bias": t["mask_decoder.output_upscaling.1.bias"],
    }
    md["upscale_conv2"] = {
        "kernel": convT("mask_decoder.output_upscaling.3.weight"),
        "bias": t["mask_decoder.output_upscaling.3.bias"],
    }
    for i in range(4):
        pre = f"mask_decoder.output_hypernetworks_mlps.{i}.layers"
        md[f"hyper{i}_lin0"] = lin(f"{pre}.0")
        md[f"hyper{i}_lin1"] = lin(f"{pre}.1")
        md[f"hyper{i}_lin2"] = lin(f"{pre}.2")
    pre = "mask_decoder.iou_prediction_head.layers"
    md["iou_lin0"] = lin(f"{pre}.0")
    md["iou_lin1"] = lin(f"{pre}.1")
    md["iou_lin2"] = lin(f"{pre}.2")

    unused = set(t) - t.accessed
    if unused and strict:
        raise ValueError(
            f"port_torch_checkpoint({variant}): {len(unused)} checkpoint "
            f"keys not consumed by the port: {sorted(unused)[:8]}..."
        )
    return {"params": p}


def build_sam_predictor(checkpoint_path: str, variant: str = "vit_h") -> SamPredictor:
    model = Sam(variant=variant)
    params = port_torch_checkpoint(checkpoint_path, variant)
    return SamPredictor(model, params)
