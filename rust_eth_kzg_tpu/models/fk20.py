"""FK20 multi-point prover: blob -> 128 cells + 128 proofs, as one jitted pipeline.

TPU-first redesign of the reference FK20 engine
(/root/reference/crates/cryptography/kzg_multi_open/src/fk20/{prover.rs:32-234,
h_poly.rs:18-68,batch_toeplitz.rs:17-125,toeplitz.rs:47-145}).

Key structural differences from the reference (same math, TPU shapes):
- The Toeplitz -> circulant embedding is a *static gather*: the 64 circulant
  rows are read out of the (reversed) coefficient vector with one precomputed
  index map + zero mask instead of building matrix objects.
- The 64 column FFTs are one batched NTT; the 128 size-64 fixed-base MSMs are
  one batched windowed-table MSM (`ops.msm.FixedBaseMSM` with an instance
  axis); the G1 FFTs batch their twiddle scalar-muls across every butterfly of
  a stage.
- Everything is batched over a leading blob axis: `prove` maps
  [B, poly_len] blobs -> [B, num_proofs] proofs + [B, num_proofs, coset] cells.

The whole prove path is pure jit (static shapes fixed by the protocol).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import FR_LIMBS
from ..ops import curve as C
from ..ops import field as F
from ..ops import msm as M
from ..ops import ntt

FR = F.FR


@dataclass(frozen=True)
class FK20Config:
    """Protocol geometry. Mainnet: poly_len=4096, coset_size=64, expansion=2."""

    poly_len: int = 4096
    coset_size: int = 64
    expansion: int = 2
    # window width for the batched fixed-base MSM tables; None disables the
    # precomputed tables (UsePrecomp::No analog) and falls back to lincomb.
    fk20_window: int | None = 8
    commit_window: int | None = 8

    @property
    def ext_size(self) -> int:  # number_of_points_to_open
        return self.poly_len * self.expansion

    @property
    def num_proofs(self) -> int:
        return self.ext_size // self.coset_size


def _circulant_index_map(poly_len: int, coset_size: int):
    """Static (index, mask) arrays mapping poly coefficients to circulant rows.

    Row i of the batch-Toeplitz system (i < coset_size) is the circulant
    embedding of Toeplitz row r_i[t] = c[poly_len - 1 - i - coset_size*t]:
      circ[i][0]      = r_i[0]
      circ[i][1..k]   = 0
      circ[i][k + t]  = r_i[k - t] = c[coset_size*t - i - 1]   (t = 1..k-1)
    where k = poly_len / coset_size. Derived from CirculantMatrix::from_toeplitz
    (toeplitz.rs:132-145) + compute_h_poly_commitments (h_poly.rs:18-57).
    """
    k = poly_len // coset_size
    idx = np.zeros((coset_size, 2 * k), dtype=np.int64)
    mask = np.zeros((coset_size, 2 * k), dtype=bool)
    for i in range(coset_size):
        idx[i, 0] = poly_len - 1 - i
        mask[i, 0] = True
        for t in range(1, k):
            j = coset_size * t - i - 1
            if 0 <= j < poly_len:
                idx[i, k + t] = j
                mask[i, k + t] = True
    return idx, mask


class FK20Prover:
    """Holds device-resident SRS tables + domains; prove() is one jit program.

    Equivalent of FK20Prover::new (prover.rs:64-125): the SRS is reversed,
    truncated by one coset, strided into coset_size vectors, group-FFT'd over
    the circulant domain, and baked into per-proof-slot MSM tables.
    """

    def __init__(
        self,
        commit_key_points: list,
        config: FK20Config,
        table_cache: str | None = None,
    ):
        cfg = config
        assert cfg.poly_len % cfg.coset_size == 0
        self.config = cfg
        k = cfg.poly_len // cfg.coset_size  # vector length before padding
        self.circulant_domain = ntt.domain(2 * k)
        self.proof_domain = ntt.domain(cfg.num_proofs)
        self.evaluation_domain = ntt.domain(cfg.ext_size)
        self.poly_domain = ntt.domain(cfg.poly_len)

        ci, cm = _circulant_index_map(cfg.poly_len, cfg.coset_size)
        self._circ_idx = jnp.asarray(ci)
        self._circ_mask = jnp.asarray(cm)
        self._slot_points = None
        self._commit_points = None

        # --- table snapshot fast path (checkpoint/resume, SURVEY.md §5) ---
        from ..utils import persist

        self._srs_fingerprint = persist.srs_fingerprint(commit_key_points)
        if table_cache and cfg.fk20_window and cfg.commit_window:
            loaded = persist.try_load_tables(
                table_cache,
                self._srs_fingerprint,
                cfg.fk20_window,
                cfg.commit_window,
                geometry=(cfg.poly_len, cfg.coset_size, cfg.expansion),
            )
            if loaded is not None:
                self.tables, self.commit_tables = loaded
                return

        # --- SRS -> per-slot fixed points (setup-time, host+device) ---
        # reversed SRS minus the last coset, strided: vector i holds
        # g1s[poly_len - 1 - coset_size - i - coset_size*t] for t = 0..k-2
        srs = commit_key_points
        vectors = []
        for i in range(cfg.coset_size):
            vec = [None] * (2 * k)  # pad to the circulant domain with identity
            for t in range(k - 1):
                vec[t] = srs[cfg.poly_len - 1 - cfg.coset_size - i - cfg.coset_size * t]
            vectors.append(vec)
        flat = [pt for vec in vectors for pt in vec]
        dev = C.points_to_device(flat)
        dev = C.G1(*(c.reshape(-1, cfg.coset_size, 2 * k) for c in dev))
        # group-FFT each SRS vector over the circulant domain: [coset, 2k]
        slot_points = self.circulant_domain.fft_g1(dev)
        # transpose -> per-slot point sets [2k, coset]
        slot_points = C.G1(*(jnp.swapaxes(c, 1, 2) for c in slot_points))
        if cfg.fk20_window is not None:
            self.tables = M.build_fixed_base_msm(
                slot_points, cfg.fk20_window, instance_ndim=1
            )
            self._slot_points = None
        else:
            self.tables = None
            self._slot_points = slot_points

        # --- commit key tables ---
        commit_pts = C.points_to_device(list(srs[: cfg.poly_len]))
        if cfg.commit_window is not None:
            self.commit_tables = M.build_fixed_base_msm(commit_pts, cfg.commit_window)
            self._commit_points = None
        else:
            self.commit_tables = None
            self._commit_points = commit_pts

        if table_cache and self.tables is not None and self.commit_tables is not None:
            persist.save_tables_file(
                table_cache,
                self._srs_fingerprint,
                fk20=self.tables,
                commit=self.commit_tables,
                geometry=(cfg.poly_len, cfg.coset_size, cfg.expansion),
            )

    # --- pipeline pieces (all shapes [L, B, ...]) ---

    def blob_to_poly(self, data: jnp.ndarray) -> jnp.ndarray:
        """Blob scalars (evaluation form, bit-reversed order) -> coefficients.

        Matches Input::Data handling (prover.rs:107-113): un-bit-reverse, IFFT.
        """
        data = ntt.bit_reverse_permutation(data, axis=-1)
        return self.poly_domain.ifft(data)

    def _h_poly_commitments(
        self, poly: jnp.ndarray, slot_sharding=None, tables=None
    ) -> C.G1:
        """poly: [L, B, poly_len] -> h-poly commitments G1 [B, k].

        With `slot_sharding` set (a NamedSharding over [L, B, slots, coset]),
        the per-slot MSM work is constrained to shard across the mesh's work
        axis (see parallel/mesh.py). `tables` must be passed explicitly when
        called under an enclosing jit: pulling self.tables from the closure
        embeds the multi-GB table arrays as HLO *constants* (the axon remote
        compiler rejects such programs outright).
        """
        cfg = self.config
        if tables is None:
            tables = self.tables
        k = cfg.poly_len // cfg.coset_size
        # circulant rows via static gather + mask: [L, B, coset, 2k]
        rows = jnp.take(poly, self._circ_idx.reshape(-1), axis=-1)
        rows = rows.reshape(poly.shape[:-1] + (cfg.coset_size, 2 * k))
        rows = jnp.where(self._circ_mask[None, None], rows, 0)
        col_fft = self.circulant_domain.fft(
            rows.reshape(FR.nlimbs, -1, 2 * k)
        ).reshape(rows.shape)
        # transpose to per-slot scalars [L, B, 2k, coset], folding the
        # circulant IFFT's 1/(2k) scale into the Fr scalars (one cheap field
        # multiply here replaces a ~130-step G1 scalar-mul after the IFFT)
        msm_scalars = jnp.swapaxes(col_fft, -1, -2)
        inv_scale = FR.broadcast_const(
            self.circulant_domain.size_inv_mont, msm_scalars.shape[1:]
        )
        msm_scalars = F.mont_mul(FR, msm_scalars, inv_scale)
        if slot_sharding is not None:
            msm_scalars = jax.lax.with_sharding_constraint(
                msm_scalars, slot_sharding
            )
        if tables is not None:
            slot_results = M.fixed_base_msm(tables, msm_scalars)  # [B, 2k]
        else:
            pts = C.G1(
                *(
                    jnp.broadcast_to(
                        c[:, None], (c.shape[0], msm_scalars.shape[1]) + c.shape[1:]
                    )
                    for c in self._slot_points
                )
            )
            slot_results = M.lincomb(pts, msm_scalars)
        # inverse group-FFT, keep first k entries (h-poly commitments); the
        # 1/(2k) scale was folded into msm_scalars above
        return self.circulant_domain.ifft_g1(
            slot_results, take_n=k, prescaled=True
        )

    def _proofs_from_h(self, h_comms: C.G1) -> C.G1:
        """h commitments [B, k] -> bit-reversed proofs [B, num_proofs]."""
        cfg = self.config
        b = h_comms.batch_shape[0]
        pad = cfg.num_proofs - h_comms.batch_shape[1]
        idp = C.identity((b, pad))
        padded = C.G1(
            *(jnp.concatenate([c, i], axis=-1) for c, i in zip(h_comms, idp))
        )
        proofs = self.proof_domain.fft_g1(padded)
        return C.G1(*(ntt.bit_reverse_permutation(c, axis=-1) for c in proofs))

    def _coset_evaluations(self, poly: jnp.ndarray) -> jnp.ndarray:
        """poly [L, B, n] -> cells [L, B, num_proofs, coset] (bit-reversed order).

        Matches compute_coset_evaluations (prover.rs:158-165).
        """
        cfg = self.config
        padded = jnp.concatenate(
            [poly, jnp.zeros(poly.shape[:-1] + (cfg.ext_size - cfg.poly_len,), poly.dtype)],
            axis=-1,
        )
        evals = self.evaluation_domain.fft(padded)
        evals = ntt.bit_reverse_permutation(evals, axis=-1)
        return evals.reshape(evals.shape[:-1] + (cfg.num_proofs, cfg.coset_size))

    def prove_from_poly(self, poly: jnp.ndarray):
        """poly coefficients [L, B, poly_len] -> (proofs G1Affine [B, num_proofs],
        cells [L, B, num_proofs, coset]).

        The full §3.2 pipeline of SURVEY.md as a single XLA program. The MSM
        tables enter as jit arguments (device buffers), never as closure
        constants.
        """
        return _prove_from_poly(self, self.tables, poly)

    def prove_from_data(self, data: jnp.ndarray):
        """Blob scalars [L, B, poly_len] (bit-reversed eval form) -> proofs+cells."""
        return _prove_from_data(self, self.tables, data)

    @partial(jax.jit, static_argnums=0)
    def extend_from_data(self, data: jnp.ndarray) -> jnp.ndarray:
        return self._coset_evaluations(self.blob_to_poly(data))

    def commit_from_poly(self, poly: jnp.ndarray) -> C.G1:
        """poly [L, B, n] -> commitments G1 [B]."""
        return _commit_from_poly(self, self.commit_tables, poly)

    def commit_from_data(self, data: jnp.ndarray) -> C.G1:
        return _commit_from_poly(self, self.commit_tables, self.blob_to_poly(data))


def pack_prove_outputs(proofs_aff: C.G1Affine, cells_mont: jnp.ndarray):
    """(proofs G1Affine [B, K], cells [L, B, K, M] Montgomery) -> one flat
    uint16 vector for a single device->host fetch: canonical standard-form
    cell scalars, then proof x/y standard-form limbs, then the identity mask.
    On the tunneled TPU each fetch is a ~20 ms round trip; the separate
    cells/proofs fetches used to put two of them on every prover-path call.
    Every element is a canonical 15-bit limb (or a 0/1 flag), so uint16
    transfer halves the fetch bytes of the int32 compute form.
    """
    from ..constants import FP_LIMBS as _FPL

    cells_std = F.from_mont(FR, cells_mont)
    px = F.from_mont(F.FP, proofs_aff.x.reshape(_FPL, -1))
    py = F.from_mont(F.FP, proofs_aff.y.reshape(_FPL, -1))
    return jnp.concatenate(
        [
            cells_std.reshape(-1),
            px.reshape(-1),
            py.reshape(-1),
            proofs_aff.inf.reshape(-1).astype(jnp.int32),
        ]
    ).astype(jnp.uint16)


def unpack_prove_outputs(host: np.ndarray, b: int, k: int, m: int):
    """Inverse of pack_prove_outputs on the fetched numpy vector.

    Returns (cells_std [L, B, K, M], proofs_x_std [FPL, B*K],
    proofs_y_std [FPL, B*K], inf [B*K])."""
    from ..constants import FP_LIMBS as _FPL

    host = np.asarray(host).astype(np.int32)
    rl = FR.nlimbs
    ncells = rl * b * k * m
    npts = b * k
    cells = host[:ncells].reshape(rl, b, k, m)
    off = ncells
    px = host[off : off + _FPL * npts].reshape(_FPL, npts)
    off += _FPL * npts
    py = host[off : off + _FPL * npts].reshape(_FPL, npts)
    off += _FPL * npts
    inf = host[off : off + npts].astype(bool)
    return cells, px, py, inf


@partial(jax.jit, static_argnums=(0, 3))
def _prove_packed_from_data(
    prover: FK20Prover, tables, data_std: jnp.ndarray, slot_sharding=None
):
    """Blob scalars (standard-form int32 [L, B, poly_len]) -> packed outputs.

    One jit covering to-Montgomery conversion, the full prove pipeline, and
    output packing — the user-level compute/recover paths feed this with ONE
    upload and drain it with ONE fetch. `slot_sharding` (a NamedSharding,
    static) constrains the FK20 proof-slot axis across a device mesh's work
    axis — the multi-chip layout of parallel/mesh.py reached through the
    public DASContext(mesh=...) API. `data_std` may arrive as uint16 (the
    transfer form of the 15-bit limbs); compute runs in int32."""
    data = F.to_mont(FR, data_std.astype(jnp.int32))
    poly = prover.blob_to_poly(data)
    if slot_sharding is not None:
        h = prover._h_poly_commitments(poly, slot_sharding, tables=tables)
        proofs = prover._proofs_from_h(h)
        cells = prover._coset_evaluations(poly)
        proofs_aff = C.batch_normalize(proofs)
    else:
        proofs_aff, cells = _prove_from_poly(prover, tables, poly)
    return pack_prove_outputs(proofs_aff, cells)


@partial(jax.jit, static_argnums=(0, 1, 4))
def _recover_prove_packed(rs, prover: FK20Prover, tables, packed: jnp.ndarray, b: int):
    """Fused recover + re-prove: packed = [e_eval std | z_small std] uint16
    flat. e is [L, B, ext]; z_small is [L, B, nz] holding the UN-spread
    vanishing-polynomial coefficients (nz = max tolerable erasures + 1),
    spread to the codeword domain at stride num_blocks on device
    (reed_solomon.rs:220-262 does the spread on host — but the dense form
    is 64x the bytes of its information content, and on a tunneled chip the
    upload is the cost). Returns uint16 [ok flags [B] | packed prove outputs].
    """
    rl = FR.nlimbs
    ext = rs.codeword_length
    nz = rs.acceptable_num_block_erasures + 1
    n = rl * b * ext
    packed = packed.astype(jnp.int32)
    e_std = packed[:n].reshape(rl, b, ext)
    z_small = packed[n : n + rl * b * nz].reshape(rl, b, nz)
    pos = np.arange(nz) * rs.num_blocks
    z_std = jnp.zeros((rl, b, ext), jnp.int32).at[:, :, pos].set(z_small)
    e_eval = F.to_mont(FR, e_std)
    d_coeffs, ok = rs._recover_device(e_eval, z_std)
    poly = d_coeffs[..., : rs.poly_len]
    proofs_aff, cells = _prove_from_poly(prover, tables, poly)
    return jnp.concatenate(
        [ok.astype(jnp.uint16), pack_prove_outputs(proofs_aff, cells)]
    )


@partial(jax.jit, static_argnums=0)
def _prove_from_poly(prover: FK20Prover, tables, poly: jnp.ndarray):
    from ..utils.tracing import span

    with span("fk20/h_poly_commitments"):
        h = prover._h_poly_commitments(poly, tables=tables)
    with span("fk20/proofs_g1_fft"):
        proofs = prover._proofs_from_h(h)
    with span("fk20/coset_evaluations"):
        cells = prover._coset_evaluations(poly)
    with span("fk20/batch_normalize"):
        out = C.batch_normalize(proofs)
    return out, cells


@partial(jax.jit, static_argnums=0)
def _prove_from_data(prover: FK20Prover, tables, data: jnp.ndarray):
    return _prove_from_poly(prover, tables, prover.blob_to_poly(data))


@partial(jax.jit, static_argnums=0)
def _commit_from_poly(prover: FK20Prover, commit_tables, poly: jnp.ndarray) -> C.G1:
    if commit_tables is not None:
        return M.fixed_base_msm(commit_tables, poly)
    pts = C.G1(
        *(
            jnp.broadcast_to(
                c[:, None], (c.shape[0], poly.shape[1]) + c.shape[1:]
            )
            for c in prover._commit_points
        )
    )
    return M.lincomb(pts, poly)
