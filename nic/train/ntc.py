"""NTC feature-pyramid trainer — the flagship ``image_compression`` loop.

Re-architects the reference's per-epoch loop
(``Projects/image_compression.py:215-303`` of
21K1113/Neural_Image_Compression_V2) for TPU/XLA:

- the whole step (crop sampling → grid sampling → MLP fwd/bwd → Adam →
  clamp) is ONE jitted function; shapes are static per (lod, phase), so
  the step is compiled once per LOD bucket (≤ max_mip_level+1 buckets,
  exactly the shape family the reference produces host-side);
- crop origins are drawn on-device from a threaded PRNG key; the LOD
  bucket itself is drawn host-side (it picks the compiled step), with the
  reference's schedule: an accumulator fires a uniform draw every
  1/UNIFORM_DISTRIBUTION_RATE steps, otherwise ``floor(-log2(U)/2)``
  clamped to max mip (image_compression.py:26-50, sample19 lineage);
- QAT phases: first 95% adds uniform noise and trains grids + MLP with
  per-step clamp (fp lr 0.01 / mlp lr 0.005, cosine-annealed —
  image_compression.py:361-365); the final 5% hard-quantizes and freezes
  the grids and fine-tunes the MLP only (two separate optax chains — the
  exact analogue of the reference's param groups + requires_grad freeze,
  :227-231);
- full-image decode is tiled (div_size semantics of
  image_compression.py:307-346) and vmapped over tiles;
- data parallelism: crops shard over a ``('data',)`` mesh axis, grids and
  MLP replicated — jit + sharding annotations insert the psum on ICI
  (no reference counterpart; SURVEY.md §5).
"""

from __future__ import annotations

import math
from dataclasses import dataclass


import jax
import jax.numpy as jnp
import numpy as np
import optax

from nic.config import CompressionConfig
from nic.core.metrics import psnr
from nic.core.quant import qat_noise, quantize_to_bit
from nic.grids import pyramid as fp_lib
from nic.grids.fastdecode import first_layer_acc, precompute_first_layer
from nic.grids.sample import decoder_input
from nic.models.mlp import apply_mlp, apply_mlp_tail, init_mlp
from nic.parallel.mesh import data_pixel_spec, replicate, shard_batch

__all__ = ["NTCState", "NTCTrainer", "sample_lod", "UniformLodSchedule"]


class UniformLodSchedule:
    """Accumulator gate: fires True every 1/rate steps
    (image_compression.py:221-226)."""

    def __init__(self, rate: float):
        self.rate = rate
        self.acc = 0.0

    def __call__(self) -> bool:
        self.acc += self.rate
        if self.acc >= 1.0:
            self.acc -= 1.0
            return True
        return False


def _k3_seed(noise_key, pixel_base):
    """[s0, s1, pixel_base, 0] int32 seed payload for kernel3's in-kernel
    feature-noise stream (train_fused_ff.eps_uniform). ``pixel_base``
    offsets the flat pixel counter — shard_map devices pass
    didx·pixels_local so the sharded stream is bit-identical to the
    single-device one."""
    kd = jax.random.key_data(noise_key).reshape(-1)
    kd = jax.lax.bitcast_convert_type(kd, jnp.int32)
    s = kd[:2] if kd.shape[0] == 2 else kd[:2] ^ kd[2:4]
    return jnp.concatenate(
        [s, jnp.stack([jnp.int32(pixel_base), jnp.int32(0)])])


def sample_lod(rng: np.random.Generator, uniform: bool, max_mip: int) -> int:
    """LOD draw (image_compression.py:29-34): uniform over [0, max_mip] or
    exponential floor(-log2(U)/2) clamped."""
    if uniform:
        return int(rng.integers(0, max_mip + 1))
    lod = int(math.floor(-math.log2(rng.random()) / 2))
    return min(lod, max_mip)


@dataclass
class NTCState:
    fp: tuple
    mlp: dict
    opt_fp: object
    opt_mlp: object
    step: int = 0
    frozen: bool = False


class NTCTrainer:
    def __init__(self, cfg: CompressionConfig, images, *, mesh=None,
                 log=None):
        """images: list indexed by mip level of [3, s, s] (2D) or
        [3, s, s, s] (3D) float arrays in [0, 1].

        ``log``: optional ``RunLog``-style callable; when set, the
        trainer emits one line per (lod, frozen) train-step build and per
        mip decode build saying which forward/backend the auto gates
        resolved to — and, when a faster kernel was rejected, the first
        failed gate condition (round-5 gate-visibility directive)."""
        self.cfg = cfg
        self.log = log if log is not None else (lambda *_a, **_k: None)
        self._gate_logged: set = set()
        # true mixed precision (unlike the reference's broken all-fp16 path,
        # readme.md:9): params/optimizer state stay fp32 masters; the
        # forward/backward compute in bf16 when MLP_NUM_DTYPE=16
        self.compute_dtype = cfg.compute_dtype()
        self.dtype = jnp.float32 if self.compute_dtype == jnp.bfloat16 else self.compute_dtype
        self.ndim = cfg.fp_dimension
        self.max_mip = cfg.effective_max_mip_level
        self.mesh = mesh
        self.images = [jnp.asarray(im, self.dtype) for im in images]

        # rbg keys generate noise ~4× cheaper on TPU than threefry — the QAT
        # noise ([pixels, 73] uniforms per step) is a measurable slice of
        # the step; statistical parity only (the reference used torch RNG)
        key = jax.random.key(cfg.seed, impl=cfg.rng_impl)
        k_fp, k_mlp, self._key = jax.random.split(key, 3)
        if cfg.is_rectangular and self.ndim != 2:
            raise ValueError(
                "rectangular geometry (IMAGE_SIZE_W) is 2D-only")
        fp, self.levels = fp_lib.create_pyramid(
            k_fp,
            cfg.feature_pyramid_hw if self.ndim == 2
            else cfg.feature_pyramid_size,
            cfg.feature_pyramid_channels,
            cfg.fp_bits,
            ndim=self.ndim,
            dtype=self.dtype,
            no_mip=cfg.tf_no_mip,
        )
        mlp = init_mlp(
            k_mlp, cfg.decoder_input_channels, cfg.hidden_layer_channels, 3, self.dtype
        )
        # the mip→level map's level count must match create_pyramid's,
        # which uses the SMALLEST axis for rectangular grids
        base_for_levels = (min(cfg.feature_pyramid_hw) if self.ndim == 2
                           else cfg.feature_pyramid_size)
        self.mip_to_level = fp_lib.pyramid_mip_levels(
            cfg.image_size, base_for_levels, cfg.tf_no_mip
        )

        # two optax chains = the reference's two param groups
        # (image_compression.py:361-365) + CosineAnnealingLR(T_max=epochs)
        self._tx_fp = optax.adam(
            optax.cosine_decay_schedule(0.01, cfg.num_epochs, alpha=0.0)
        )
        self._tx_mlp = optax.adam(
            optax.cosine_decay_schedule(0.005, cfg.num_epochs, alpha=0.0)
        )
        if mesh is not None:
            fp = replicate(fp, mesh)
            mlp = replicate(mlp, mesh)
            self.images = [replicate(im, mesh) for im in self.images]
        self.state = NTCState(
            fp=fp,
            mlp=mlp,
            opt_fp=self._tx_fp.init(fp),
            opt_mlp=self._tx_mlp.init(mlp),
        )
        self._step_fns: dict = {}
        self._decode_fns: dict = {}
        self._lod_rng = np.random.default_rng(cfg.seed + 1)
        self._uniform_gate = UniformLodSchedule(cfg.uniform_distribution_rate)
        self._probe_key = jax.random.key(cfg.seed + 7, impl=cfg.rng_impl)
        self._tree_eq = None

    # ------------------------------------------------------------------
    # sampling geometry (static per lod)
    # ------------------------------------------------------------------

    def _geometry(self, lod: int):
        fl = self.mip_to_level[lod]
        n = max(1, self.cfg.crop_size // (2**lod))
        step = 2.0 ** (lod - (fl + 1) * 2)
        return fl, n, step

    def _sparse_g0(self) -> bool:
        from nic.grids.sample import effective_pe_flags

        return effective_pe_flags(
            self.cfg.compression_method, self.ndim, self.cfg.tf_use_tri_pe
        )[1]

    def _use_tri_pe(self) -> bool:
        from nic.grids.sample import effective_pe_flags

        return effective_pe_flags(
            self.cfg.compression_method, self.ndim, self.cfg.tf_use_tri_pe
        )[0]

    # ------------------------------------------------------------------
    # jitted train step, specialized per (lod, frozen-phase)
    # ------------------------------------------------------------------

    def _build_step(self, lod: int, frozen: bool, jit: bool = True):
        cfg = self.cfg
        fl, n, step = self._geometry(lod)
        ndim = self.ndim
        dataset = self.images[lod if lod < len(self.images) else -1]
        data_size = dataset.shape[1]
        data_hw = tuple(dataset.shape[1:1 + ndim])
        num_crops = cfg.num_crops
        sparse_g0 = self._sparse_g0()
        use_tri_pe = self._use_tri_pe()
        # Surgical mixed precision (MLP_NUM_DTYPE=16): grid gather/interp,
        # QAT noise, grid gradients, and grid updates all stay fp32 — the
        # round-1 A/B showed grid-parameter gradients do not survive bf16
        # sampling (BASELINE.md, 30.01 vs 38.97 dB @20k). Only the MLP dot
        # products run with bf16 inputs (fp32 accumulation) on the MXU.
        mixed = self.compute_dtype == jnp.bfloat16
        dtype = jnp.float32 if mixed else self.compute_dtype
        matmul_dtype = jnp.bfloat16 if mixed else None

        mesh = self.mesh
        # TRAIN_FORWARD=auto: the fused kernels evaluate the SAME value
        # and gradients (to summation-order rounding — 320k convergence
        # parity in BASELINE.md), so on TPU auto takes the fastest
        # eligible kernel path; elsewhere (CPU tests, meshes) the XLA
        # gather path.
        forward = cfg.train_forward
        if forward == "auto":
            # fastest eligible kernel on TPU — single device AND under a
            # mesh (the sharded gates below fall back kernel3_sharded →
            # kernel2_sharded → gather when geometry disqualifies)
            forward = ("kernel3" if jax.default_backend() == "tpu"
                       else "gather")
        use_folded = forward == "folded"
        # TRAIN_FORWARD=kernel: the gather-built [N, F] features feed one
        # fused Pallas kernel computing fwd+loss+bwd in a single pass
        # (nic.kernels.train_fused). Single-device only: under a mesh the
        # [N, F] matrix is sharded and the XLA SPMD path handles it.
        use_kernel = forward in ("kernel", "kernel2", "kernel3") and mesh is None
        train_gelu = cfg.train_gelu
        kernel_rows = None
        if use_kernel:
            from nic.kernels.train_fused import pick_block_rows

            kernel_rows = pick_block_rows(num_crops * n**ndim)
            use_kernel = kernel_rows is not None
        # TRAIN_FORWARD=kernel2: same fused pass, but the kernel reduces
        # dz1 to NODE-resolution dP/dC1 planes in VMEM and the bwd unfolds
        # them with tiny node-resolution matmuls — no [N, F] cotangent, no
        # scatter (nic.kernels.train_fused, node-gradient section). Gated
        # to the 2D dense-G0 power-of-two lattice with step ≤ 1; anything
        # else falls back to the dx-writeback kernel ("kernel" mode).
        # first-failed-condition notes from the kernel gates, surfaced in
        # the one-line gate log (round-5 gate-visibility directive)
        gate_notes: list = []

        def _fail(msg):
            gate_notes.append(msg)
            return False, None, None

        def _k2_gate(crops_eff: int):
            """kernel2 lattice-geometry gate for ``crops_eff`` crops per
            device; returns (ok, rowsb, f)."""
            from nic.kernels.train_fused import pick_block_rows

            if not (0 < step <= 1 and ndim in (2, 3)
                    and not (ndim == 2 and sparse_g0) and crops_eff >= 1
                    # 2D handles rectangular images (per-axis node planes
                    # in the unfold); 3D stays cubic
                    and (ndim == 2 or len(set(data_hw)) == 1)):
                return _fail(
                    f"kernel2: lattice gate (step={step}, ndim={ndim}, "
                    f"sparse_g0={sparse_g0}, crops={crops_eff}, "
                    f"data_hw={data_hw})")
            f_inv = 1.0 / step
            if abs(f_inv - round(f_inv)) >= 1e-9:
                return _fail(f"kernel2: 1/step={f_inv:.4g} not an integer")
            f = int(round(f_inv))
            f1 = 2 * f
            rows_cap = pick_block_rows(crops_eff * n**ndim)
            if rows_cap is None:
                return _fail(
                    f"kernel2: {crops_eff * n**ndim} pixels unsupported "
                    "by the block-row picker")
            if ndim == 2:
                rowsb = min(max(rows_cap // n, f1), n)
                ok = (f1 <= 8 and n % rowsb == 0 and rowsb % f1 == 0
                      and (n + 8) % f == 0 and (n + 8) % f1 == 0
                      # the planar (oc, R) target/output blocks need a
                      # 128-multiple lane dim (Pallas TPU block rule);
                      # tiny LOD crops fall back to "kernel" mode, whose
                      # R is always 2048 or the whole array
                      and (rowsb * n) % 128 == 0)
            else:
                # 3D (methods 3/4): slab blocks. Per-block rows stay ≤
                # 2048 (R=4096 crashes the Mosaic compile helper), so
                # rowsb may be SMALLER than f — both dp and dc1 slab
                # bases are per-block dynamic in the unfold.
                rowsb = min(max(rows_cap // (n * n), 1), n)
                ok = (f1 <= 8 and rowsb >= 1 and n % rowsb == 0
                      and (n + 8) % f == 0 and (n + 8) % f1 == 0
                      and (rowsb * n * n) % 128 == 0)
            if not ok:
                return _fail(
                    f"kernel2: block geometry (n={n}, rowsb={rowsb}, "
                    f"f1={f1})")
            return ok, rowsb, f

        # TRAIN_FORWARD=kernel3: the feature build itself moves into the
        # kernel — z1 is assembled in VMEM from folded node-resolution
        # P/C1 windows + in-kernel triangular PE, and dW1 comes from the
        # node planes contracted with the grid values; no [N, F] matrix
        # exists in either direction (nic.kernels.train_fused_ff). Gated
        # to the 2D dense-G0 lattice with tri-PE. Under the default
        # feature-resolution QAT noise, ε is drawn INSIDE the kernel
        # (train_fused_ff.eps_uniform — a counter-hash stream; same
        # distribution as core.quant.qat_noise, different stream, the
        # rng_impl=rbg precedent).
        noise_node = cfg.qat_noise_where == "node"

        def _k3_gate(crops_eff: int):
            from nic.kernels.train_fused import pick_block_rows
            from nic.kernels.train_fused_ff import ff_geometry

            # the in-kernel noise counter is gid·fslot + j in int32:
            # keep the whole pixel×feature grid under 2^31 (flagship is
            # 84M; this only excludes absurdly large crop batches)
            fslot = -(-(5 * cfg.feature_pyramid_channels
                        + 2 * cfg.pe_channels + 1) // 8) * 8
            if not (ndim == 2 and not sparse_g0 and use_tri_pe
                    and 0 < step <= 1
                    and cfg.pe_channels <= 8 and crops_eff >= 1
                    and num_crops * n * n * fslot < 2**31):
                return _fail(
                    f"kernel3: needs 2D dense-G0 triangular-PE with "
                    f"step ≤ 1 and pe ≤ 8 (ndim={ndim}, "
                    f"sparse_g0={sparse_g0}, tri_pe={use_tri_pe}, "
                    f"step={step}, pe={cfg.pe_channels})")
            f_inv = 1.0 / step
            if abs(f_inv - round(f_inv)) >= 1e-9:
                return _fail(f"kernel3: 1/step={f_inv:.4g} not an integer")
            f = int(round(f_inv))
            rows_cap = pick_block_rows(crops_eff * n * n)
            if rows_cap is None:
                return _fail(
                    f"kernel3: {crops_eff * n * n} pixels unsupported by "
                    "the block-row picker")
            rowsb = min(max(rows_cap // n, 2 * f), n // 2)
            if rowsb < 1 or n % rowsb:
                return _fail(
                    f"kernel3: row block {rowsb} does not tile n={n}")
            ok = ff_geometry(crops=crops_eff, n=n, rowsb=rowsb, f=f,
                             hidden=cfg.hidden_layer_channels,
                             pe_channels=cfg.pe_channels)
            if not ok:
                return _fail(
                    f"kernel3: ff_geometry rejected (n={n}, rowsb={rowsb},"
                    f" f={f}) — VMEM/lane constraints")
            return ok, rowsb, f

        # 3D kernel3 gate (nic.kernels.train_fused_ff3): same lattice
        # conditions as the 3D kernel2 plus the noise-counter bound;
        # dense AND sparse G0 and both PE families are supported (the 3D
        # kernel computes PE in XLA staging, not in-kernel)
        def _k3d_gate(crops_eff: int):
            from nic.kernels.train_fused import pick_block_rows
            from nic.kernels.train_fused_ff3 import ff3_geometry

            nfeat_l = cfg.decoder_input_channels
            fslot = -(-nfeat_l // 8) * 8
            if not (ndim == 3 and 0 < step <= 1 and crops_eff >= 1
                    and cfg.pe_channels <= 8
                    and num_crops * n**3 * fslot < 2**31
                    and len(set(data_hw)) == 1):
                return _fail(
                    f"kernel3-3d: needs a cubic 3D lattice with step ≤ 1 "
                    f"and pe ≤ 8 (ndim={ndim}, step={step}, "
                    f"pe={cfg.pe_channels}, data_hw={data_hw})")
            f_inv = 1.0 / step
            if abs(f_inv - round(f_inv)) >= 1e-9:
                return _fail(
                    f"kernel3-3d: 1/step={f_inv:.4g} not an integer")
            f = int(round(f_inv))
            rows_cap = pick_block_rows(crops_eff * n**3)
            if rows_cap is None:
                return _fail(
                    f"kernel3-3d: {crops_eff * n**3} voxels unsupported "
                    "by the block-row picker")
            rowsb = min(max(rows_cap // (n * n), 1), n)
            if rowsb < 1 or n % rowsb:
                return _fail(
                    f"kernel3-3d: slab block {rowsb} does not tile n={n}")
            ok = ff3_geometry(crops=crops_eff, n=n, rowsb=rowsb, f=f,
                              hidden=cfg.hidden_layer_channels,
                              pe_channels=cfg.pe_channels, nfeat=nfeat_l)
            if not ok:
                return _fail(
                    f"kernel3-3d: ff3_geometry rejected (n={n}, "
                    f"rowsb={rowsb}, f={f}) — VMEM/lane constraints")
            return ok, rowsb, f

        use_kernel3 = False
        k3_rowsb = k3_f = None
        if use_kernel and forward == "kernel3":
            gate = _k3_gate if ndim == 2 else _k3d_gate
            use_kernel3, k3_rowsb, k3_f = gate(num_crops)
        use_kernel2 = False
        k2_rowsb = k2_f = None
        if use_kernel and not use_kernel3 and forward in ("kernel2",
                                                          "kernel3"):
            use_kernel2, k2_rowsb, k2_f = _k2_gate(num_crops)
        # sharded kernel2: under a mesh, shard_map the fused node-gradient
        # kernel per device over the 'data' (crop) axis and pmean the
        # grads over ICI — the fast train path scales across chips. The
        # 'pixel' mesh axis (if any) duplicates compute (kernel blocks
        # are not pixel-sharded); typical training meshes are data-only.
        use_kernel_sharded = False
        use_k3_sharded = False
        ks_rowsb = ks_f = None
        data_axis_size = 1
        if mesh is not None and forward in ("kernel2", "kernel3"):
            data_axis_size = int(mesh.shape.get("data", 1))
            if num_crops % data_axis_size == 0:
                crops_loc = num_crops // data_axis_size
                if forward == "kernel3":
                    gate = _k3_gate if ndim == 2 else _k3d_gate
                    use_k3_sharded, ks_rowsb, ks_f = gate(crops_loc)
                if not use_k3_sharded:
                    use_kernel_sharded, ks_rowsb, ks_f = _k2_gate(crops_loc)
        any_sharded = use_kernel_sharded or use_k3_sharded
        # introspection for tests/debugging: which forward actually engaged
        self._forward_mode = ("kernel3_sharded" if use_k3_sharded else
                              "kernel2_sharded" if use_kernel_sharded else
                              "kernel3" if use_kernel3 else
                              "kernel2" if use_kernel2 else
                              "kernel" if use_kernel else
                              "folded" if use_folded else "gather")
        # one-line gate visibility (RunLog): what the auto gates resolved
        # to, and — when a faster kernel was rejected — the first failed
        # condition, so a 434-vs-230 steps/s gap is diagnosable from the
        # printlog alone
        gate_key = ("step", lod, frozen)
        if gate_key not in self._gate_logged:
            self._gate_logged.add(gate_key)
            line = (f"train forward gate (lod={lod}, frozen={frozen}): "
                    f"{self._forward_mode}"
                    f" [TRAIN_FORWARD={cfg.train_forward}"
                    + (f" -> {forward}" if cfg.train_forward == "auto"
                       else "") + "]")
            if gate_notes:
                line += " — " + "; ".join(gate_notes)
            self.log(line)
        mip_to_level = self.mip_to_level

        def noised_grids(fp, noise_key):
            # node-resolution QAT noise: perturb the two ACTIVE grids'
            # nodes instead of every per-pixel decoder-input channel. This
            # models what hard quantization actually does at eval (node
            # errors, bilinearly interpolated and correlated across pixels
            # sharing corners) and draws ~100× fewer uniforms per step than
            # the reference's [N, F] feature noise. PE/lod channels carry
            # no noise in this mode — they are never quantized.
            k0, k1 = jax.random.split(noise_key)
            fp = list(fp)
            fp[fl * 2] = fp[fl * 2] + qat_noise(
                k0, fp[fl * 2].shape, cfg.fp_bits, jnp.float32
            )
            fp[fl * 2 + 1] = fp[fl * 2 + 1] + qat_noise(
                k1, fp[fl * 2 + 1].shape, cfg.fp_bits, jnp.float32
            )
            return tuple(fp)

        def gather_features(fp, origins, noise_key):
            """The reference-shaped [N, F] decoder-input build (grid
            gather/interp + PE + QAT noise), shared by the XLA forward and
            the fused-kernel loss path."""
            fp = tuple(g.astype(dtype) for g in fp)
            if not frozen and noise_node:
                fp = noised_grids(fp, noise_key)

            def one(origin):
                return decoder_input(
                    fp, fl, origin, step, n,
                    pe_channels=cfg.pe_channels, mip_level=lod, ndim=ndim,
                    use_tri_pe=use_tri_pe, sparse_g0=sparse_g0, dtype=dtype,
                    g1_quirk=cfg.tf_g1_quirk, grid_vjp=cfg.grid_vjp,
                )

            x = jax.vmap(one)(origins)  # [crops, n^ndim, F]
            # data parallel over crops + pixel ("sequence") parallel inside
            # a crop; the partitioner psums grid/MLP grads over the mesh
            x = shard_batch(x, mesh, data_pixel_spec(1))
            x = x.reshape(num_crops * n**ndim, -1)
            if not frozen and not noise_node:
                # QAT noise must be added in fp32: at FP_BITS=8 its amplitude
                # (2^-9) is below bf16 resolution near 0.5 (ε≈2^-8), so a
                # bf16 activation silently drops it and QAT degenerates.
                x = x.astype(jnp.float32) + qat_noise(
                    noise_key, x.shape, cfg.fp_bits, jnp.float32
                )
            return x

        def batch_forward(fp, mlp, origins, noise_key):
            if use_folded:
                fpc = tuple(g.astype(dtype) for g in fp)
                if not frozen and noise_node:
                    fpc = noised_grids(fpc, noise_key)
                return folded_forward(fpc, mlp, origins, noise_key)
            x = gather_features(fp, origins, noise_key)
            return apply_mlp(mlp, x, matmul_dtype=matmul_dtype)

        def folded_forward(fp, mlp, origins, noise_key):
            # Folded-first-layer training forward (TRAIN_FORWARD=folded):
            # the decode-side fastdecode algebra, differentiated through.
            # W1 is folded into the grids ONCE per step at node resolution,
            # so the [N, F] feature matrix is never built and the first
            # layer's pixel-resolution matmul disappears; the backward pass
            # scatter-adds into the H-lane planes and reaches G0/G1 through
            # the tiny node-resolution fold matmuls.
            planes = precompute_first_layer(
                fp, fl, mlp, ndim=ndim,
                channels=cfg.feature_pyramid_channels,
                pe_channels=cfg.pe_channels, sparse_g0=sparse_g0,
            )

            def one(origin):
                return first_layer_acc(
                    fp, mlp, lod, image_size=cfg.image_size,
                    mip_to_level=mip_to_level, pe_channels=cfg.pe_channels,
                    use_tri_pe=use_tri_pe, ndim=ndim, sparse_g0=sparse_g0,
                    origin=tuple(origin[d] for d in range(ndim)), n=n,
                    g1_quirk=cfg.tf_g1_quirk, planes=planes,
                )

            acc = jax.vmap(one)(origins)  # [crops, n.., H]
            acc = shard_batch(acc, mesh, data_pixel_spec(1))
            acc = acc.reshape(num_crops * n**ndim, -1)
            if not frozen and not noise_node:
                # feature noise in the folded basis: (x+ε)·W1 = x·W1 + ε·W1
                # (same ε draw as the gather path — equal key and shape)
                eps = qat_noise(
                    noise_key, (num_crops * n**ndim, mlp["w1"].shape[0]),
                    cfg.fp_bits, jnp.float32,
                )
                if matmul_dtype is None:
                    acc = acc + eps @ mlp["w1"]
                else:
                    acc = acc + jnp.dot(
                        eps.astype(matmul_dtype),
                        mlp["w1"].astype(matmul_dtype),
                        preferred_element_type=jnp.float32,
                    )
            return apply_mlp_tail(mlp, acc, matmul_dtype=matmul_dtype)

        def targets_of(origins):
            def one(origin):
                sizes = (3,) + (n,) * ndim
                start = (jnp.zeros((), jnp.int32),) + tuple(origin)
                return jax.lax.dynamic_slice(dataset, start, sizes)

            t = jax.vmap(one)(origins)  # [B, 3, n, ...]
            t = jnp.moveaxis(t, 1, -1).reshape(num_crops, n**ndim, 3)
            t = shard_batch(t, mesh, data_pixel_spec(1))
            return t.reshape(-1, 3)

        def loss_fn(fp, mlp, origins, noise_key):
            if use_kernel3:
                from nic.kernels.train_fused_ff import fused_train_ff
                from nic.kernels.train_fused_ff3 import fused_train_ff3

                fpc = tuple(g.astype(dtype) for g in fp)
                nbits = None
                seed = jnp.zeros((4,), jnp.int32)
                if not frozen and noise_node:
                    fpc = noised_grids(fpc, noise_key)
                elif not frozen:
                    # feature-resolution noise drawn in-kernel: the key's
                    # raw words seed the counter-hash stream per step
                    nbits = cfg.fp_bits
                    seed = _k3_seed(noise_key, jnp.int32(0))
                tgt = targets_of(origins)
                # grid + FULL MLP grads are hand-built inside the
                # primitive (node planes + tiny contractions); the noise
                # add above routes d(noised) → d(raw) by identity
                if ndim == 2:
                    loss, out = fused_train_ff(
                        fpc[fl * 2], fpc[fl * 2 + 1], mlp, tgt, origins,
                        seed, num_crops, n, k3_rowsb, k3_f,
                        cfg.pe_channels, float(lod), matmul_dtype,
                        train_gelu, nbits,
                    )
                else:
                    loss, out = fused_train_ff3(
                        fpc[fl * 2], fpc[fl * 2 + 1], mlp, tgt, origins,
                        seed[:3], num_crops, n, k3_rowsb, k3_f,
                        cfg.pe_channels, float(lod), sparse_g0,
                        use_tri_pe, matmul_dtype, train_gelu, nbits,
                    )
                return loss, (out, tgt)
            if use_kernel2:
                from nic.kernels.train_fused import (fused_mlp_loss_ng,
                                                     fused_mlp_loss_ng3)

                x = gather_features(fp, origins, noise_key)
                tgt = targets_of(origins)
                # grid grads flow ONLY through the kernel's node-space
                # backward; stop_gradient kills the gather VJP entirely
                xs = jax.lax.stop_gradient(x.astype(jnp.float32))
                if ndim == 2:
                    loss, out = fused_mlp_loss_ng(
                        fp[fl * 2], fp[fl * 2 + 1], mlp, xs, tgt, origins,
                        num_crops, n, k2_rowsb, k2_f, matmul_dtype, train_gelu,
                    )
                else:
                    loss, out = fused_mlp_loss_ng3(
                        fp[fl * 2], fp[fl * 2 + 1], mlp, xs, tgt, origins,
                        num_crops, n, k2_rowsb, k2_f, sparse_g0,
                        matmul_dtype, train_gelu,
                    )
                return loss, (out, tgt)
            if use_kernel:
                from nic.kernels.train_fused import fused_mlp_loss

                x = gather_features(fp, origins, noise_key)
                tgt = targets_of(origins)
                loss, out = fused_mlp_loss(
                    mlp, x.astype(jnp.float32), tgt, matmul_dtype, train_gelu
                )
                return loss, (out, tgt)
            out = batch_forward(fp, mlp, origins, noise_key)
            tgt = targets_of(origins)
            return jnp.mean((out - tgt) ** 2), (out, tgt)

        tx_fp, tx_mlp = self._tx_fp, self._tx_mlp

        if any_sharded:
            from nic.parallel.mesh import shard_map_nocheck
            from jax.sharding import PartitionSpec as P

            from nic.kernels.train_fused import (fused_mlp_loss_ng,
                                                 fused_mlp_loss_ng3)

            crops_l = num_crops // data_axis_size
            npix_l = crops_l * n**ndim
            nfeat = cfg.decoder_input_channels

            def _inner(fp, mlp, origins_l, noise_key):
                didx = jax.lax.axis_index("data")

                def local_loss_k3(fp_, mlp_):
                    # kernel3 per device: feature-free fused step on the
                    # local crop shard; grads pmean'd by the caller. The
                    # in-kernel noise stream gets didx·npix_l as its
                    # pixel base — bit-identical to single-device.
                    from nic.kernels.train_fused_ff import fused_train_ff

                    fpc = tuple(g.astype(dtype) for g in fp_)
                    nbits = None
                    seed = jnp.zeros((4,), jnp.int32)
                    if not frozen and noise_node:
                        fpc = noised_grids(fpc, noise_key)
                    elif not frozen:
                        nbits = cfg.fp_bits
                        seed = _k3_seed(noise_key, didx * npix_l)

                    def tone(origin):
                        sizes = (3,) + (n,) * ndim
                        start = (jnp.zeros((), jnp.int32),) + tuple(origin)
                        return jax.lax.dynamic_slice(dataset, start, sizes)

                    t = jax.vmap(tone)(origins_l)
                    tgt = jnp.moveaxis(t, 1, -1).reshape(-1, 3)
                    if ndim == 2:
                        loss, out = fused_train_ff(
                            fpc[fl * 2], fpc[fl * 2 + 1], mlp_, tgt,
                            origins_l, seed, crops_l, n, ks_rowsb, ks_f,
                            cfg.pe_channels, float(lod), matmul_dtype,
                            train_gelu, nbits,
                        )
                    else:
                        from nic.kernels.train_fused_ff3 import (
                            fused_train_ff3)

                        loss, out = fused_train_ff3(
                            fpc[fl * 2], fpc[fl * 2 + 1], mlp_, tgt,
                            origins_l, seed[:3], crops_l, n, ks_rowsb,
                            ks_f, cfg.pe_channels, float(lod), sparse_g0,
                            use_tri_pe, matmul_dtype, train_gelu, nbits,
                        )
                    return loss, (out, tgt)

                def local_loss(fp_, mlp_):
                    if use_k3_sharded:
                        return local_loss_k3(fp_, mlp_)
                    fpc = tuple(g.astype(dtype) for g in fp_)
                    if not frozen and noise_node:
                        fpc = noised_grids(fpc, noise_key)

                    def one(origin):
                        return decoder_input(
                            fpc, fl, origin, step, n,
                            pe_channels=cfg.pe_channels, mip_level=lod,
                            ndim=ndim, use_tri_pe=use_tri_pe,
                            sparse_g0=sparse_g0, dtype=dtype,
                            g1_quirk=cfg.tf_g1_quirk,
                        )

                    x = jax.vmap(one)(origins_l).reshape(npix_l, nfeat)
                    if not frozen and not noise_node:
                        # bit-parity with the single-device stream: draw
                        # the full [N, F] noise and slice this device's
                        # crop shard
                        eps = qat_noise(
                            noise_key, (num_crops * n**ndim, nfeat),
                            cfg.fp_bits, jnp.float32)
                        eps = jax.lax.dynamic_slice_in_dim(
                            eps, didx * npix_l, npix_l, 0)
                        x = x.astype(jnp.float32) + eps

                    def tone(origin):
                        sizes = (3,) + (n,) * ndim
                        start = (jnp.zeros((), jnp.int32),) + tuple(origin)
                        return jax.lax.dynamic_slice(dataset, start, sizes)

                    t = jax.vmap(tone)(origins_l)
                    tgt = jnp.moveaxis(t, 1, -1).reshape(-1, 3)
                    xs = jax.lax.stop_gradient(x.astype(jnp.float32))
                    if ndim == 2:
                        loss, out = fused_mlp_loss_ng(
                            fp_[fl * 2], fp_[fl * 2 + 1], mlp_, xs, tgt,
                            origins_l, crops_l, n, ks_rowsb, ks_f,
                            matmul_dtype, train_gelu)
                    else:
                        loss, out = fused_mlp_loss_ng3(
                            fp_[fl * 2], fp_[fl * 2 + 1], mlp_, xs, tgt,
                            origins_l, crops_l, n, ks_rowsb, ks_f,
                            sparse_g0, matmul_dtype, train_gelu)
                    return loss, (out, tgt)

                if frozen:
                    (loss, (out, tgt)), g_mlp = jax.value_and_grad(
                        lambda m: local_loss(fp, m), has_aux=True)(mlp)
                    grads = jax.lax.pmean(g_mlp, "data")
                else:
                    (loss, (out, tgt)), grads = jax.value_and_grad(
                        local_loss, argnums=(0, 1), has_aux=True)(fp, mlp)
                    grads = jax.lax.pmean(grads, "data")
                return jax.lax.pmean(loss, "data"), out, tgt, grads

            sharded_grads = shard_map_nocheck(
                _inner, mesh,
                in_specs=(P(), P(), P("data"), P()),
                out_specs=(P(), P("data"), P("data"), P()),
            )

        def train_step(fp, mlp, opt_fp, opt_mlp, key):
            k_crop, k_noise = jax.random.split(key)
            origins = jax.random.randint(
                k_crop, (num_crops, ndim), 0,
                jnp.asarray([d - n + 1 for d in data_hw], jnp.int32),
            )
            if any_sharded:
                loss, out, tgt, grads = sharded_grads(
                    fp, mlp, origins, k_noise)
                if frozen:
                    upd, opt_mlp = tx_mlp.update(grads, opt_mlp, mlp)
                    mlp = optax.apply_updates(mlp, upd)
                else:
                    g_fp, g_mlp = grads
                    upd_fp, opt_fp = tx_fp.update(g_fp, opt_fp, fp)
                    fp = optax.apply_updates(fp, upd_fp)
                    upd_mlp, opt_mlp = tx_mlp.update(g_mlp, opt_mlp, mlp)
                    mlp = optax.apply_updates(mlp, upd_mlp)
                    fp = fp_lib.pyramid_clamp(fp, fl, cfg.fp_bits)
                if cfg.tf_write_psnr:
                    step_psnr = psnr(
                        quantize_to_bit(out, cfg.output_bits),
                        quantize_to_bit(tgt, cfg.output_bits),
                    )
                else:
                    step_psnr = jnp.float32(jnp.nan)
                return fp, mlp, opt_fp, opt_mlp, loss, step_psnr
            if frozen:
                (loss, (out, tgt)), g_mlp = jax.value_and_grad(
                    lambda m: loss_fn(fp, m, origins, k_noise), has_aux=True
                )(mlp)
                upd, opt_mlp = tx_mlp.update(g_mlp, opt_mlp, mlp)
                mlp = optax.apply_updates(mlp, upd)
            else:
                (loss, (out, tgt)), (g_fp, g_mlp) = jax.value_and_grad(
                    loss_fn, argnums=(0, 1), has_aux=True
                )(fp, mlp, origins, k_noise)
                upd_fp, opt_fp = tx_fp.update(g_fp, opt_fp, fp)
                fp = optax.apply_updates(fp, upd_fp)
                upd_mlp, opt_mlp = tx_mlp.update(g_mlp, opt_mlp, mlp)
                mlp = optax.apply_updates(mlp, upd_mlp)
                fp = fp_lib.pyramid_clamp(fp, fl, cfg.fp_bits)
            if cfg.tf_write_psnr:
                # per-step PSNR of the quantized crop batch — the reference
                # computes this only under TF_WRITE_PSNR
                # (image_compression.py:259-261); skipping it saves a full
                # quantize+reduce over every trained pixel each step
                step_psnr = psnr(
                    quantize_to_bit(out, cfg.output_bits),
                    quantize_to_bit(tgt, cfg.output_bits),
                )
            else:
                step_psnr = jnp.float32(jnp.nan)
            return fp, mlp, opt_fp, opt_mlp, loss, step_psnr

        return jax.jit(train_step, donate_argnums=(0, 1, 2, 3)) if jit else train_step

    def _step_fn(self, lod: int, frozen: bool):
        key = (lod, frozen)
        if key not in self._step_fns:
            self._step_fns[key] = self._build_step(lod, frozen)
        return self._step_fns[key]

    def _scan_fn(self, lod: int, frozen: bool, chunk: int):
        """Compiled multi-step loop: lax.scan over ``chunk`` train steps —
        one host dispatch instead of ``chunk`` (the reference's Python
        epoch loop, image_compression.py:220, re-done the XLA way). Only
        valid while the LOD is constant (tf_no_mip) and no phase boundary
        is crossed."""
        key = ("scan", lod, frozen, chunk)
        if key not in self._step_fns:
            step = self._build_step(lod, frozen, jit=False)

            def body(carry, subkey):
                fp, mlp, opt_fp, opt_mlp = carry
                fp, mlp, opt_fp, opt_mlp, loss, p = step(fp, mlp, opt_fp, opt_mlp, subkey)
                return (fp, mlp, opt_fp, opt_mlp), (loss, p)

            def run(fp, mlp, opt_fp, opt_mlp, key):
                keys = jax.random.split(key, chunk)
                carry, hist = jax.lax.scan(body, (fp, mlp, opt_fp, opt_mlp), keys)
                return carry, hist

            self._step_fns[key] = jax.jit(run, donate_argnums=(0, 1, 2, 3))
        return self._step_fns[key]

    def _mip_scan_fn(self, frozen: bool, chunk: int):
        """Compiled multi-step loop for LOD/mip training: the per-step LOD
        sequence is drawn host-side (same accumulator-gate + RNG stream as
        ``train_step``, so the sequence is identical) and fed to a
        ``lax.scan`` whose body ``lax.switch``-es between per-LOD branches.
        Each branch is traced once with its own static crop geometry
        (crop n = crop_size/2^lod, its own mip image and grid level), and
        XLA's conditional executes only the selected branch at runtime —
        so a chunk costs one host dispatch instead of ``chunk``, at the
        per-step cost of whichever LOD actually ran. This is what makes
        the reference's LOD training protocol (image_compression.py:221-245,
        sample18–21) run at compiled speed rather than per-step dispatch."""
        key = ("mipscan", frozen, chunk)
        if key not in self._step_fns:
            branches = [
                self._build_step(lod, frozen, jit=False)
                for lod in range(self.max_mip + 1)
            ]

            def body(carry, x):
                lod, subkey = x
                fp, mlp, opt_fp, opt_mlp = carry
                fp, mlp, opt_fp, opt_mlp, loss, p = jax.lax.switch(
                    lod, branches, fp, mlp, opt_fp, opt_mlp, subkey
                )
                return (fp, mlp, opt_fp, opt_mlp), (loss, p)

            def run(fp, mlp, opt_fp, opt_mlp, key, lods):
                keys = jax.random.split(key, chunk)
                carry, hist = jax.lax.scan(
                    body, (fp, mlp, opt_fp, opt_mlp), (lods, keys)
                )
                return carry, hist

            self._step_fns[key] = jax.jit(run, donate_argnums=(0, 1, 2, 3))
        return self._step_fns[key]

    # ------------------------------------------------------------------
    # in-train SDC guard (nic.obs.integrity; extends the round-3 decode
    # guards INTO long training runs — VERDICT r3 #6). After each scan
    # chunk, one train step is executed TWICE from the identical carry
    # and key through a NON-donating compile, and every output (params,
    # optimizer state, loss) is compared bit-for-bit on device. XLA
    # executions are deterministic, so any disagreement is hardware
    # corruption — the per-process ~1-LSB-RMS SDC the tunneled chip
    # demonstrated corrupts repeatedly, which a periodic probe catches.
    # The probe results are DISCARDED (training is bit-identical with
    # the guard on or off). Persistent mismatch raises SDCError; resume
    # from the last interval checkpoint (TF_RESUME) is the recovery.
    # ------------------------------------------------------------------

    def _probe_fn(self, lod: int, frozen: bool):
        key = ("probe", lod, frozen)
        if key not in self._step_fns:
            self._step_fns[key] = jax.jit(
                self._build_step(lod, frozen, jit=False))
        return self._step_fns[key]

    def _sdc_probe(self, lod: int) -> None:
        from nic.obs.integrity import SDCError, tree_equal_fn

        if self._tree_eq is None:
            self._tree_eq = tree_equal_fn()
        s = self.state
        # independent key stream: the guard must not perturb training
        # (bit-identical runs with the guard on or off)
        self._probe_key, sub = jax.random.split(self._probe_key)
        fn = self._probe_fn(lod, s.frozen)
        args = (s.fp, s.mlp, s.opt_fp, s.opt_mlp, sub)
        for attempt in range(3):
            a = fn(*args)
            b = fn(*args)
            if bool(self._tree_eq(a, b)):
                return
            import warnings

            warnings.warn(
                f"in-train SDC probe mismatch at step {s.step} "
                f"(attempt {attempt + 1}/3) — two executions of the same "
                "train step disagree; device corruption suspected")
        raise SDCError(
            f"persistent train-step corruption at step {s.step}; restart "
            "the process and resume from the newest checkpoint (TF_RESUME)")

    def train_many(self, num_steps: int, chunk: int = 1000):
        """Run ``num_steps`` epochs in compiled lax.scan chunks — one host
        dispatch per chunk. Constant-LOD (tf_no_mip) uses the plain scan;
        mip training scans a host-drawn LOD sequence through per-LOD
        switch branches. Returns (loss_hist, psnr_hist) arrays.

        Handles the 95% freeze boundary exactly like the per-step path.
        With ``sdc_guard_train`` (default on), each chunk is followed by a
        double-executed probe step (see ``_sdc_probe``).
        """
        s = self.state
        cfg = self.cfg
        loss_hist: list = []
        psnr_hist: list = []
        remaining = num_steps
        while remaining > 0:
            # steps until the freeze boundary (first step with step > 95% —
            # image_compression.py:227 checks before the step runs)
            if not s.frozen:
                boundary = int(cfg.num_epochs * 0.95) + 1 - s.step
                if boundary <= 0:
                    self.freeze_and_quantize()
                    continue
                n = min(remaining, boundary, chunk)
            else:
                n = min(remaining, chunk)
            if n != chunk:
                # tail/boundary chunks: run the largest power of two ≤ n so
                # odd remainders decompose into ≤ log2(chunk) recurring
                # scan lengths (cached) instead of compiling a fresh
                # program per distinct remainder
                n = 1 << (n.bit_length() - 1)
            self._key, sub = jax.random.split(self._key)
            if self.max_mip == 0:
                run = self._scan_fn(0, s.frozen, n)
                (s.fp, s.mlp, s.opt_fp, s.opt_mlp), (lh, ph) = run(
                    s.fp, s.mlp, s.opt_fp, s.opt_mlp, sub
                )
            else:
                lods = np.asarray(
                    [
                        sample_lod(self._lod_rng, self._uniform_gate(),
                                   self.max_mip)
                        for _ in range(n)
                    ],
                    np.int32,
                )
                run = self._mip_scan_fn(s.frozen, n)
                (s.fp, s.mlp, s.opt_fp, s.opt_mlp), (lh, ph) = run(
                    s.fp, s.mlp, s.opt_fp, s.opt_mlp, sub, jnp.asarray(lods)
                )
            s.step += n
            remaining -= n
            loss_hist.append(np.asarray(lh))
            psnr_hist.append(np.asarray(ph))
            if cfg.sdc_guard_train and n >= 64:
                # guard full-size chunks only (tiny boundary chunks would
                # pay a probe per handful of steps); LOD 0 probes the
                # largest compiled geometry
                self._sdc_probe(0)
        return np.concatenate(loss_hist), np.concatenate(psnr_hist)

    # ------------------------------------------------------------------
    # public API
    # ------------------------------------------------------------------

    def freeze_and_quantize(self) -> None:
        """End-of-QAT transition (image_compression.py:227-231)."""
        self.state.fp = fp_lib.pyramid_quantize_all(self.state.fp, self.cfg.fp_bits)
        self.state.frozen = True

    def train_step(self):
        """One epoch: host LOD draw → jitted device step. Returns
        (loss, step_psnr, lod) as device scalars + python int."""
        s = self.state
        cfg = self.cfg
        if not s.frozen and s.step > cfg.num_epochs * 0.95:
            self.freeze_and_quantize()
        lod = sample_lod(self._lod_rng, self._uniform_gate(), self.max_mip)
        self._key, sub = jax.random.split(self._key)
        fn = self._step_fn(lod, s.frozen)
        s.fp, s.mlp, s.opt_fp, s.opt_mlp, loss, step_psnr = fn(
            s.fp, s.mlp, s.opt_fp, s.opt_mlp, sub
        )
        s.step += 1
        return loss, step_psnr, lod

    # ------------------------------------------------------------------
    # checkpoint / resume (preemption-safe training; replaces the
    # reference's encode_from_middle flags, movie_3d_comp.py:29-35)
    # ------------------------------------------------------------------

    def save_checkpoint(self, path: str) -> None:
        from nic.io.artifacts import save_checkpoint

        save_checkpoint(
            path, self.state.step,
            {"fp": self.state.fp, "mlp": self.state.mlp},
            {"fp": self.state.opt_fp, "mlp": self.state.opt_mlp},
            extra={"frozen": self.state.frozen},
        )

    def load_checkpoint(self, path: str) -> None:
        import json

        import numpy as _np

        from nic.io.artifacts import load_checkpoint

        s = self.state
        step, params, opt = load_checkpoint(
            path, {"fp": s.fp, "mlp": s.mlp}, {"fp": s.opt_fp, "mlp": s.opt_mlp}
        )
        with _np.load(path) as z:
            meta = json.loads(bytes(z["__meta__"]).decode())
        frozen = bool(meta.get("frozen", False))
        if frozen and step <= self.cfg.num_epochs * 0.95:
            # protocol EXTENSION: the checkpoint comes from a run whose
            # freeze point (95% of ITS num_epochs) already passed, but the
            # new schedule's freeze lies ahead — unfreeze so the grids
            # train again (from their quantized values) until the new 95%
            # mark, matching the requested protocol. Keeping them frozen
            # silently degrades an extended run to the old run's quality
            # (observed: a 100k→320k extension pinned at the 100k PSNR).
            import warnings

            warnings.warn(
                f"resumed a post-freeze checkpoint (step {step}) into a "
                f"{self.cfg.num_epochs}-epoch schedule; unfreezing grids "
                "for the extended training phase"
            )
            frozen = False
        self.state = NTCState(
            fp=params["fp"], mlp=params["mlp"],
            opt_fp=opt["fp"], opt_mlp=opt["mlp"],
            step=step, frozen=frozen,
        )

    # ------------------------------------------------------------------
    # tiled full-image decode (image_compression.py:307-346 semantics)
    # ------------------------------------------------------------------

    def _build_decode(self, mip: int, div_size: int):
        cfg = self.cfg
        fl = self.mip_to_level[mip]
        step = 2.0 ** (mip - (fl + 1) * 2)
        ndim = self.ndim
        decode_size = cfg.image_size // (2**mip)
        hw = cfg.image_hw if ndim == 2 else (decode_size,) * ndim
        decode_hw = tuple(s // (2**mip) for s in hw)
        rect = len(set(decode_hw)) > 1
        power = self.max_mip - mip
        div_slice = 2 ** max(power - div_size, 0)
        if rect:
            # rectangular decodes run full-frame (fused kernel or folded
            # path, both rect-native); the square tile lattice below
            # doesn't apply and memory is bounded by the folded planes
            div_slice = 1
        n = decode_size // div_slice  # per-tile sample count
        sparse_g0 = self._sparse_g0()
        use_tri_pe = self._use_tri_pe()
        dtype = self.dtype

        def tile(fp, mlp, origin):
            x = decoder_input(
                fp, fl, origin, step, n,
                pe_channels=cfg.pe_channels, mip_level=mip, ndim=ndim,
                use_tri_pe=use_tri_pe, sparse_g0=sparse_g0, dtype=dtype,
                g1_quirk=cfg.tf_g1_quirk,
            )
            return apply_mlp(mlp, x).reshape((n,) * ndim + (3,))

        backend = cfg.resolved_decode_backend
        n_mesh_dev = (
            int(np.prod(self.mesh.devices.shape)) if self.mesh is not None
            else 1
        )
        branch = None  # gate-visibility label, logged below
        if div_slice == 1:
            if backend == "pallas" and ndim == 2 and not sparse_g0:
                branch = ("fused-v2 sharded" if n_mesh_dev > 1
                          else "fused-v2") + (" rect" if rect else "")
                # fused Pallas kernel (nic.kernels.decode_fused_v2 rev2) —
                # the fastest backend on TPU (falls back to fast_decode
                # internally for thumbnail mips / odd sizes); rectangular
                # (IMAGE_SIZE_W — the Kodak 768×512 geometry) rides the
                # same kernel via a rectangular tile grid; on a
                # multi-device mesh the image rows shard over the devices
                # (nic.kernels.decode_sharded — SP over the pixel axis)
                from nic.kernels.decode_fused_v2 import decode_image_fused_v2
                from nic.kernels.decode_sharded import \
                    decode_image_fused_sharded

                m2l = self.mip_to_level
                mesh = self.mesh
                isz = hw if rect else cfg.image_size

                def decode(fp, mlp):
                    if n_mesh_dev > 1:
                        return decode_image_fused_sharded(
                            fp, mlp, mip, mesh, image_size=isz,
                            mip_to_level=m2l, pe_channels=cfg.pe_channels,
                            use_tri_pe=use_tri_pe, g1_quirk=cfg.tf_g1_quirk,
                        )
                    return decode_image_fused_v2(
                        fp, mlp, mip, image_size=isz,
                        mip_to_level=m2l, pe_channels=cfg.pe_channels,
                        use_tri_pe=use_tri_pe, g1_quirk=cfg.tf_g1_quirk,
                    )
            elif backend == "pallas" and ndim == 3:
                branch = ("fused-3d sharded" if n_mesh_dev > 1
                          else "fused-3d")
                # fused spatiotemporal kernel (nic.kernels.decode_fused_3d)
                # — methods 3 AND 4 (sparse G0 only changes the host-side
                # P fold); same internal thumbnail-mip fallback; frames
                # shard over a multi-device mesh
                from nic.kernels.decode_fused_3d import decode_volume_fused
                from nic.kernels.decode_sharded import \
                    decode_volume_fused_sharded

                m2l = self.mip_to_level
                mesh = self.mesh

                def decode(fp, mlp):
                    if n_mesh_dev > 1:
                        return decode_volume_fused_sharded(
                            fp, mlp, mip, mesh, image_size=cfg.image_size,
                            mip_to_level=m2l, pe_channels=cfg.pe_channels,
                            use_tri_pe=use_tri_pe, sparse_g0=sparse_g0,
                            g1_quirk=cfg.tf_g1_quirk,
                        )
                    return decode_volume_fused(
                        fp, mlp, mip, image_size=cfg.image_size,
                        mip_to_level=m2l, pe_channels=cfg.pe_channels,
                        use_tri_pe=use_tri_pe, sparse_g0=sparse_g0,
                        g1_quirk=cfg.tf_g1_quirk,
                    )
            elif backend in ("fast", "pallas") or rect:
                branch = ("folded-xla (pallas ineligible: sparse-G0 2D)"
                          if backend == "pallas" else
                          "folded-xla rect" if rect else "folded-xla")
                # folded-first-layer decode (nic.grids.fastdecode): exact,
                # ~2× fewer matmul FLOPs, no [N, F] feature matrix
                # (pallas lands here for 3D / sparse-G0 artifacts;
                # rectangular decodes of ANY backend too — the per-axis
                # sample counts ride straight through the fold)
                from nic.grids.fastdecode import fast_decode

                m2l = self.mip_to_level

                def decode(fp, mlp):
                    return fast_decode(
                        fp, mlp, mip, image_size=cfg.image_size,
                        mip_to_level=m2l, pe_channels=cfg.pe_channels,
                        use_tri_pe=use_tri_pe, ndim=ndim, sparse_g0=sparse_g0,
                        g1_quirk=cfg.tf_g1_quirk,
                        n=decode_hw if rect else None,
                    )
            else:
                branch = "xla gather"

                def decode(fp, mlp):
                    return tile(fp, mlp, jnp.zeros((ndim,), jnp.int32))
        else:
            # tile origins on a regular ndim lattice (div_size semantics of
            # image_compression.py:307-346, :335-340 for 3D); vmap over all
            # tiles then stitch by reshape/transpose — compile time is
            # O(1) in the tile count
            ij = jnp.stack(
                jnp.meshgrid(*([jnp.arange(div_slice)] * ndim),
                             indexing="ij"),
                axis=-1,
            ).reshape(-1, ndim)
            origins = ij * n

            mesh = self.mesh
            # interleave (tile_i, intile_i) axes: 2D (0,2,1,3,4),
            # 3D (0,3,1,4,2,5,6)
            perm = tuple(
                a for d in range(ndim) for a in (d, ndim + d)
            ) + (2 * ndim,)

            if backend in ("fast", "pallas"):
                # folded-first-layer tiles: hoist the fold out of the vmap
                # (the fused kernels are whole-asset; tiled decode takes
                # the folded XLA path)
                from nic.grids.fastdecode import (fast_decode,
                                                  precompute_first_layer)

                m2l = self.mip_to_level
                channels = cfg.feature_pyramid_channels

                def tile_fn(fp, mlp, origin, planes):
                    return fast_decode(
                        fp, mlp, mip, image_size=cfg.image_size,
                        mip_to_level=m2l, pe_channels=cfg.pe_channels,
                        use_tri_pe=use_tri_pe, ndim=ndim, sparse_g0=sparse_g0,
                        origin=tuple(origin[d] for d in range(ndim)), n=n,
                        g1_quirk=cfg.tf_g1_quirk, planes=planes,
                    )

                def all_tiles(fp, mlp):
                    planes = precompute_first_layer(
                        fp, fl, mlp, ndim=ndim, channels=channels,
                        pe_channels=cfg.pe_channels, sparse_g0=sparse_g0,
                    )
                    return jax.vmap(
                        lambda o: tile_fn(fp, mlp, o, planes)
                    )(origins)
            else:
                def all_tiles(fp, mlp):
                    return jax.vmap(lambda o: tile(fp, mlp, o))(origins)

            branch = (f"tiled ({div_slice ** ndim} tiles, "
                      + ("folded-xla" if backend in ("fast", "pallas")
                         else "xla gather") + ")")

            def decode(fp, mlp):
                tiles = all_tiles(fp, mlp)
                if mesh is not None:
                    # decode tiles data-parallel over the mesh (grids/MLP
                    # replicated; no halo needed — gathers are local)
                    from jax.sharding import PartitionSpec as P

                    tiles = shard_batch(
                        tiles, mesh, P("data", *([None] * (ndim + 1)))
                    )
                t = tiles.reshape((div_slice,) * ndim + (n,) * ndim + (3,))
                return t.transpose(perm).reshape((decode_size,) * ndim + (3,))

        gate_key = ("decode", mip, div_size)
        if gate_key not in self._gate_logged:
            self._gate_logged.add(gate_key)
            self.log(f"decode backend gate (mip={mip}): {branch} "
                     f"[DECODE_BACKEND={cfg.decode_backend} -> {backend}]")
        return jax.jit(decode)

    def decode(self, mip: int, div_size: int | None = None,
               quantized: bool = True):
        """Decode the full asset at ``mip`` from (optionally) hard-quantized
        grids. Returns [s, s(, s), 3] in [0, 1]. ``div_size`` defaults to
        the DIV_SIZE config key (reference default 10,
        image_compression.py:307)."""
        if div_size is None:
            div_size = self.cfg.div_size
        key = (mip, div_size)
        if key not in self._decode_fns:
            self._decode_fns[key] = self._build_decode(mip, div_size)
        fp = self.state.fp
        if quantized and not self.state.frozen:
            fp = fp_lib.pyramid_quantize_all(fp, self.cfg.fp_bits)
        return self._decode_fns[key](fp, self.state.mlp)
