"""NumPy oracle transcribing the *formulas* of the reference repo
(21K1113/Neural_Image_Compression_V2) for golden-value parity tests.

These are independent re-derivations of the math documented in SURVEY.md §2
(quantizer, positional encodings, grid corner gather + interpolation), kept
deliberately naive/loopy so a disagreement localizes the bug to the
production code. Coordinate convention: the oracle follows the reference's
``fp[:, y, x]`` gather (grid axis 1 = second coordinate), so callers
transpose grids when comparing against nic's axis-aligned convention.
"""

from __future__ import annotations

import itertools
import math

import numpy as np


# --- quantizer (models.py:5-71) ---

def quantize(x, bits):
    s = 2**bits - 1
    return np.floor(np.asarray(x, dtype=np.float64) * s + 0.5) / s


def save4fp(x, bits):
    s = 2**bits - 1
    return (np.floor(np.asarray(x, dtype=np.float64) * s + 0.5) + 2 ** (bits - 1) - 1).astype(np.uint8)


def load4fp(code, bits):
    return (code.astype(np.float64) - (2 ** (bits - 1) - 1)) / (2**bits - 1)


def quant_range(bits):
    return -(2**bits - 1) / 2 ** (bits + 1), 0.5


# --- positional encodings (utils.py:198-227) ---

def sinusoidal_pe(coords, num_channels):
    """coords: [dim, N] → [num_channels*dim, N]."""
    coords = np.asarray(coords, dtype=np.float64)
    dim, n = coords.shape
    pe = np.zeros((num_channels * dim, n))
    div_term = np.exp(
        np.arange(0, num_channels, 2, dtype=np.float64)
        * -(math.log(10000.0) / num_channels)
    )
    for i in range(dim):
        # reference writes into pe[:, block] of an [N, nc*dim] array then
        # transposes; equivalent row-wise fill here
        block = np.zeros((n, num_channels))
        block[:, 0::2] = np.sin(coords[i][:, None] * div_term)
        block[:, 1::2] = np.cos(coords[i][:, None] * div_term[: (num_channels // 2)])
        pe[num_channels * i : num_channels * (i + 1), :] = block.T
    return pe


def tri(x, offset=0.5):
    return 2 * np.abs((x - offset) % 2 - 1) - 1


def triangular_pe(coords, num_channels):
    """coords: [dim, N] → [num_channels*dim, N] (utils.py:211-223 loop)."""
    coords = np.asarray(coords, dtype=np.float64)
    dim, n = coords.shape
    octaves = num_channels // 2
    pe = np.zeros((num_channels * dim, n))
    for octave in range(octaves):
        div = 2**octave
        for i, offset in enumerate((0.5, 0.0)):
            if octave == 0 and i == 0:
                continue
            pe[num_channels - (octave * 2 + i + 1) : dim * num_channels : num_channels, :] = tri(
                coords / div, offset=offset
            )
    return pe


# --- pyramid structure (fp_def.py:8-34) ---

def pyramid_levels(base_size):
    count = int(math.log2(base_size))
    return (count + 1) // 2


def mip_levels_dict(image_size, base_size, no_mip=False):
    levels = 1 if no_mip else pyramid_levels(base_size)
    out = {}
    for i in range(int(math.log2(image_size)) + 1):
        fl = i // 2 - 1
        out[i] = min(max(fl, 0), levels - 1)
    return out


# --- grid sampling (fp_def.py:81-223 + image_compression.py:71-211) ---

def create_g0_g1_2d(fp, fl, x0, y0, step, n, pe_channels, use_tri_pe=True):
    """Single-crop decoder-input rows [n*n, C*5 + pe*2 + 1] sans lod plane.

    fp: list of grids [C, S, S] in the reference's (y, x) axis order.
    Flattening is x-major (meshgrid 'ij' with x first), matching
    fp_def.py:115-145.
    """
    g0_grid = fp[fl * 2]
    g1_grid = fp[fl * 2 + 1]
    c = g0_grid.shape[0]
    xt = (np.arange(n, dtype=np.float64) + x0) * step
    yt = (np.arange(n, dtype=np.float64) + y0) * step
    xi = np.floor(xt).astype(int)
    yi = np.floor(yt).astype(int)
    x1t, y1t = xt / 2, yt / 2
    x1i = np.floor(x1t).astype(int)
    y1i = np.floor(y1t).astype(int)

    rows = []
    pe_coords = []
    weights_on = int(1 // (step / 2)) != 1
    for ix in range(n):
        for iy in range(n):
            g0 = [
                g0_grid[:, yi[iy], xi[ix]],
                g0_grid[:, yi[iy] + 1, xi[ix]],
                g0_grid[:, yi[iy], xi[ix] + 1],
                g0_grid[:, yi[iy] + 1, xi[ix] + 1],
            ]
            g1c = [
                g1_grid[:, y1i[iy], x1i[ix]],
                g1_grid[:, y1i[iy] + 1, x1i[ix]],
                g1_grid[:, y1i[iy], x1i[ix] + 1],
                g1_grid[:, y1i[iy] + 1, x1i[ix] + 1],
            ]
            if weights_on:
                xk = x1t[ix] - x1i[ix]
                yk = y1t[iy] - y1i[iy]
                w = [(1 - xk) * (1 - yk), (1 - xk) * yk, xk * (1 - yk), xk * yk]
                g1 = sum(wi * gi for wi, gi in zip(w, g1c))
            else:
                g1 = sum(g1c)
            rows.append(np.concatenate(g0 + [g1]))
            pe_coords.append((x1t[ix], y1t[iy]))
    feats = np.asarray(rows)  # [n*n, 5C]
    coords = np.asarray(pe_coords).T  # [2, n*n]
    pe = (triangular_pe if use_tri_pe else sinusoidal_pe)(coords, pe_channels)
    return np.concatenate([feats, pe.T], axis=1)


def create_g0_g1_3d(fp, fl, origin, step, n, pe_channels, sparse_g0=False):
    """3D decoder-input rows (methods 3 / 4) sans lod plane.

    fp grids [C, S, S, S] in the reference's (z, y, x) axis order; origin =
    (x0, y0, z0); flattening x-major then y then z (meshgrid 'ij').
    Method 4 (sparse_g0): G0 gathers only the 4 even-parity corners
    (fp_def.py:107-112) and PE is sinusoidal (fp_def.py:208).
    """
    g0_grid = fp[fl * 2]
    g1_grid = fp[fl * 2 + 1]
    x0, y0, z0 = origin
    ts = [(np.arange(n, dtype=np.float64) + o) * step for o in (x0, y0, z0)]
    iis = [np.floor(t).astype(int) for t in ts]
    t1s = [t / 2 for t in ts]
    i1s = [np.floor(t1).astype(int) for t1 in t1s]

    def corner3(grid, idx, off):
        # reference gathers fp[:, z, y, x]; off = (dx, dy, dz)
        return grid[:, idx[2] + off[2], idx[1] + off[1], idx[0] + off[0]]

    # reference g_0..g_7 order (create_g_3d): (dz,dy,dx) =
    # 000,100,010,110,001,101,011,111 → as (dx,dy,dz): lexicographic product
    full_corners = list(itertools.product((0, 1), repeat=3))  # (dx,dy,dz) u-major
    # map to reference enumeration order: their list is
    # [(0,0,0),(0,0,1),(0,1,0),(0,1,1),(1,0,0),(1,0,1),(1,1,0),(1,1,1)] in
    # (dx,dy,dz)?? — their g_k index fp[:, z+dz, y+dy, x+dx] with order
    # g0:000 g1:(dz=1) g2:(dy=1) g3:(dz=1,dy=1) g4:(dx=1) g5:(dx,dz) g6:(dx,dy) g7:111
    ref_order = [
        (0, 0, 0), (0, 0, 1), (0, 1, 0), (0, 1, 1),
        (1, 0, 0), (1, 0, 1), (1, 1, 0), (1, 1, 1),
    ]  # (dx, dy, dz)
    assert full_corners == ref_order
    sparse_order = [(0, 0, 0), (0, 1, 1), (1, 0, 1), (1, 1, 0)]  # fp_def.py:107-112

    weights_on = int(1 // (step / 2)) != 1
    rows = []
    pe_coords = []
    for ix in range(n):
        for iy in range(n):
            for iz in range(n):
                idx0 = (iis[0][ix], iis[1][iy], iis[2][iz])
                idx1 = (i1s[0][ix], i1s[1][iy], i1s[2][iz])
                g0_offsets = sparse_order if sparse_g0 else ref_order
                g0 = [corner3(g0_grid, idx0, off) for off in g0_offsets]
                g1c = {off: corner3(g1_grid, idx1, off) for off in ref_order}
                if weights_on:
                    fr = [t1s[d][i] - i1s[d][i] for d, i in zip(range(3), (ix, iy, iz))]
                    g1 = sum(
                        g
                        * math.prod(fr[d] if off[d] else 1 - fr[d] for d in range(3))
                        for off, g in g1c.items()
                    )
                else:
                    g1 = sum(g1c.values())
                rows.append(np.concatenate(g0 + [g1]))
                pe_coords.append((t1s[0][ix], t1s[1][iy], t1s[2][iz]))
    feats = np.asarray(rows)
    coords = np.asarray(pe_coords).T
    pe = (sinusoidal_pe if sparse_g0 else triangular_pe)(coords, pe_channels)
    return np.concatenate([feats, pe.T], axis=1)
