"""MXU-shaped stem convolution: 7x7 stride-2 over RGB via space-to-depth.

Why: XLA pads a convolution's input-channel contraction to the 128-wide MXU
lane tile, so the stem conv (3 input channels, inherited from torchvision's
conv1 — ``/root/reference/models.py:49-51``) runs at ~4 TFLOP/s on a chip
that measures ~144 TFLOP/s on matmuls; at 1280x1280 it is the hottest op in
the model.

Reformulation (exact, tested against ``lax.conv_general_dilated``):

    input  [B, H, W, 3]   -> s2d(4) -> [B, H/4, W/4, 48]
    output [B, H/2, W/2, O] <- un-s2d(2) <- [B, H/4, W/4, 4*O]

    conv7x7/2  ==  conv3x3/1 on the s2d(4) domain with a sparse
                   [3, 3, 48, 4*O] kernel built from the dense 7x7 taps.

The contraction deepens from 3 to 48x9=432 (=> ~1.2x lane padding instead
of ~42x) and both channel dims land on full MXU tiles. The tap scatter is a
static gather (``k4 = k7_flat[INDEX]``), so autodiff gives the correct
7x7-kernel gradient for free (scatter-add back through the gather).
"""

from __future__ import annotations

import functools

import einops
import jax
import jax.numpy as jnp
import numpy as np

_F = 4  # input space-to-depth factor
_G = 2  # output space-to-depth factor (= input stride)


@functools.lru_cache(maxsize=None)
def _tap_index(kh: int, kw: int, cin: int, pad: int):
    """Gather map from flat [kh*kw*cin + 1] (last = zero) to
    [3, 3, F*F*cin, G*G] positions, plus the conv padding to use.

    For output position y = G*u' + ey (ey < G) and tap t = ky - pad:
    input row y_in = G*y + t' .. here stride==G: y_in = G*(G*u'+ey)/...:
    y_in = 2*(2u'+ey) + (ky - pad) = 4u' + (2*ey + ky - pad), so the s2d(4)
    block offset is s = 2*ey + ky - pad with block index floor(s/4) in
    {-1, 0, 1} and intra-block offset s mod 4.
    """
    smin = 0 * 2 + 0 - pad
    smax = 2 * (_G - 1) + (kh - 1) - pad
    dmin = smin // _F
    dmax = smax // _F
    assert (dmin, dmax) == (-1, 1), (dmin, dmax)

    idx = np.full((3, 3, _F * _F * cin, _G * _G), kh * kw * cin, np.int32)
    for ey in range(_G):
        for ex in range(_G):
            for ky in range(kh):
                for kx in range(kw):
                    sy = 2 * ey + ky - pad
                    sx = 2 * ex + kx - pad
                    du, dy = sy // _F + 1, sy % _F
                    dv, dx = sx // _F + 1, sx % _F
                    for c in range(cin):
                        cin_flat = (dy * _F + dx) * cin + c
                        cout_s2d = ey * _G + ex
                        idx[du, dv, cin_flat, cout_s2d] = (
                            ky * kw + kx
                        ) * cin + c
    return idx


def s2d4_host(img: np.ndarray) -> np.ndarray:
    """Host-side space-to-depth(4): [H, W, C] -> [H/4, W/4, 16*C], channel
    order (dy, dx, c) — the layout ``stem_conv_s2d`` consumes directly.

    Done on the host (numpy, any dtype) because on TPU the [.., 3]-channel
    image lives lane-padded 3->128 in tiled HBM; the on-device rearrange
    costs ~6 ms/step at the flagship shape vs ~0.9 ms for casting a
    pre-s2d uint8 batch (measured, see ROADMAP). Byte count is identical
    either way — s2d is a bijection.
    """
    h, w, c = img.shape
    assert h % _F == 0 and w % _F == 0, (h, w)
    return np.ascontiguousarray(
        img.reshape(h // _F, _F, w // _F, _F, c)
        .transpose(0, 2, 1, 3, 4)
        .reshape(h // _F, w // _F, _F * _F * c)
    )


def stem_conv_s2d(x: jnp.ndarray, k7: jnp.ndarray) -> jnp.ndarray:
    """7x7 stride-2 pad-3 conv with the output left in s2d(2) form.

    x: [B, H, W, 3] (H, W % 4 == 0) or pre-s2d(4) [B, H/4, W/4, 48]
    (``s2d4_host``); k7: [7, 7, 3, O].
    Returns [B, H/4, W/4, 4*O], channel order (ey, ex, o).
    """
    kh, kw, cin, o = k7.shape
    pad = kh // 2

    if x.shape[-1] == _F * _F * cin:
        xs = x  # already s2d(4) on the host
    else:
        assert x.shape[-1] == cin, (x.shape, cin)
        xs = einops.rearrange(
            x, "b (u dy) (v dx) c -> b u v (dy dx c)", dy=_F, dx=_F
        )  # [B, H/4, W/4, 48]

    idx = jnp.asarray(_tap_index(kh, kw, cin, pad))
    k_flat = jnp.concatenate(
        [k7.reshape(kh * kw * cin, o), jnp.zeros((1, o), k7.dtype)], axis=0
    )
    k4 = k_flat[idx]  # [3, 3, 48, 4, O] via trailing broadcast
    k4 = k4.reshape(3, 3, _F * _F * cin, _G * _G * o).astype(x.dtype)

    from .conv3x3 import conv3x3_auto

    return conv3x3_auto(xs, k4)  # [B, H/4, W/4, 4*O]


def stem_conv(x: jnp.ndarray, k7: jnp.ndarray) -> jnp.ndarray:
    """7x7 stride-2 pad-3 conv, NHWC. x: [B, H, W, 3] (H, W % 4 == 0);
    k7: [7, 7, 3, O]. Returns [B, H/2, W/2, O] in x.dtype."""
    ys = stem_conv_s2d(x, k7)
    return einops.rearrange(
        ys, "b u v (ey ex o) -> b (u ey) (v ex) o", ey=_G, ex=_G
    )


def stem_pool_s2d(ys: jnp.ndarray) -> jnp.ndarray:
    """3x3 stride-2 pad-1 max-pool applied directly to the stem conv's
    s2d(2) output (post BN/ReLU, so values are >= 0 and zero-padding at the
    top/left border cannot win a max).

    ys: [B, U, V, 4*O] with channel order (ey, ex, o);
    returns [B, U, V, O] — the stride-4, O-channel stem feature map.

    Derivation: output row p pools input rows 2p-1, 2p, 2p+1, which live at
    s2d blocks (p-1, ey=1), (p, ey=0), (p, ey=1); same for columns. Nine
    unit-stride block-shifted slices, no reduce_window.
    """
    b, u, v, c4 = ys.shape
    o = c4 // (_G * _G)
    # Stay 4D: the (ey, ex) tap is a contiguous channel slice of the
    # (ey ex o)-ordered channel dim — a 6D reshape would pad the minor dim
    # and slice strided, which XLA lays out terribly.
    padded = jnp.pad(ys, ((0, 0), (1, 0), (1, 0), (0, 0)))
    taps_y = [(-1, 1), (0, 0), (0, 1)]  # (block shift du, parity ey)
    out = None
    for du, ey in taps_y:
        for dv, ex in taps_y:
            ch = (ey * _G + ex) * o
            tap = padded[
                :, du + 1 : du + 1 + u, dv + 1 : dv + 1 + v,
                ch : ch + o,
            ]
            out = tap if out is None else jnp.maximum(out, tap)
    return out


def stem_conv_reference(x: jnp.ndarray, k7: jnp.ndarray) -> jnp.ndarray:
    """Direct XLA formulation (oracle for tests; slow on TPU)."""
    return jax.lax.conv_general_dilated(
        x,
        k7.astype(x.dtype),
        window_strides=(2, 2),
        padding=[(3, 3), (3, 3)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=x.dtype,
    )
