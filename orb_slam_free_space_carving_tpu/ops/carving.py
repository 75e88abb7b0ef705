"""Free-space carving kernels: batched ray-march voting over a voxel grid.

TPU re-design of the CARV core (``src/Modeler/FreespaceDelaunayAlgorithm.cc``).
The reference walks tetrahedra of a CGAL Delaunay complex along each
camera->point visibility ray, incrementing free-space vote counts per cell
(``markTetrahedraCrossingConstraint`` ``:832-1006``), then extracts the surface
separating carved (free) from uncarved cells with a Boykov-Kolmogorov min-cut
(``tetsToTris_maxFlowSimple`` ``:1517-1661``).

Pointer-chasing tet walks don't map to TPU; the same *semantics* — "space
between a camera and the points it observes is free; the surface lies where
rays terminate" — is expressed as a dense voxel computation (SURVEY.md
section 7 "CARV recast"):

- every active visibility constraint (keyframe, point) becomes a ray;
- all rays are marched in one batched kernel: S samples per ray scattered as
  free-space votes into a [R,R,R] grid (the analog of cell vote counts);
- point endpoints scatter into an occupancy-evidence grid (the analog of
  Delaunay vertices bounding the free region);
- the min-cut smoothing becomes a damped mean-field / Jacobi relaxation of a
  binary MRF with data term = votes vs. evidence and smoothness lambda
  (``.cc:1579`` lambda=0.05 regime), run as a jitted stencil iteration;
- the mesh is the free/occupied interface (extracted host-side by surface
  nets in models/carver.py), with spurious frustum-boundary faces suppressed
  by requiring dilated point evidence (the analog of excluding facets on
  bounding vertices, ``.cc:1620-1640``).

Carving is *recomputed from the full current constraint set* at the (throttled)
mesh cadence — this is how the reference semantics of point deletion/motion
(re-carving) are honored exactly without incremental bookkeeping: deletes/BA
moves simply change the constraint set the next sweep sees
(``SFMTranscriptInterface_Delaunay.cpp:397-414`` throttles recompute to >=5 s).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp


class CarveGrids(NamedTuple):
    votes: jnp.ndarray       # [R,R,R] float32 free-space vote accumulator
    evidence: jnp.ndarray    # [R,R,R] float32 point-endpoint evidence
    origin: jnp.ndarray      # [3] world position of voxel (0,0,0) corner
    scale: jnp.ndarray       # scalar: world units per voxel


def compute_bounds(points: jnp.ndarray, mask: jnp.ndarray, margin: float = 1.15):
    """Axis-aligned bounds around valid points (the reference builds a bounding
    box at a multiple of the data extent, ``createBounds`` ``.cc:775-830``)."""
    big = 1e9
    p = jnp.where(mask[:, None], points, jnp.array([big, big, big]))
    lo = jnp.min(p, axis=0)
    p = jnp.where(mask[:, None], points, jnp.array([-big, -big, -big]))
    hi = jnp.max(p, axis=0)
    center = 0.5 * (lo + hi)
    half = 0.5 * (hi - lo) * margin + 1e-3
    return center - half, center + half


def carve_votes_chunked(
    ray_origins, ray_targets, ray_mask, lo, hi,
    resolution: int = 128, n_samples: int = 96, weight: float = 1.0,
    chunk: int = 2048,
):
    """Chunked ray-march: identical result to :func:`carve_votes`, issued as
    ceil(B/chunk) smaller device programs that ACCUMULATE into the grids.

    The single-dispatch form monopolizes the device for the whole scatter
    (~1-2 s at bench scale on the TPU: scatter-add into a 128^3 grid is
    serialization-bound); on the shared device that parks every tracking
    dispatch behind it for ~20 frames and collapses the tracker.  Chunking
    gives the scheduler preemption points between chunks at identical total
    work."""
    B = ray_origins.shape[0]
    if B <= chunk:
        return carve_votes(ray_origins, ray_targets, ray_mask, lo, hi,
                           resolution=resolution, n_samples=n_samples,
                           weight=weight)
    R = resolution
    votes = jnp.zeros((R, R, R), jnp.float32)
    evidence = jnp.zeros((R, R, R), jnp.float32)
    # Pad to a whole number of chunks so every dispatch shares one compile.
    n_chunks = -(-B // chunk)
    pad = n_chunks * chunk - B
    if pad:
        ray_origins = jnp.concatenate(
            [ray_origins, jnp.zeros((pad, 3), ray_origins.dtype)])
        ray_targets = jnp.concatenate(
            [ray_targets, jnp.zeros((pad, 3), ray_targets.dtype)])
        ray_mask = jnp.concatenate([ray_mask, jnp.zeros(pad, bool)])
    for i in range(n_chunks):
        sl = slice(i * chunk, (i + 1) * chunk)
        votes, evidence = _carve_votes_into(
            votes, evidence, ray_origins[sl], ray_targets[sl], ray_mask[sl],
            lo, hi, resolution=resolution, n_samples=n_samples, weight=weight,
        )
    return votes, evidence


@functools.partial(jax.jit, static_argnames=("resolution", "n_samples"),
                   donate_argnums=(0, 1))
def _carve_votes_into(votes0, evidence0, ray_origins, ray_targets, ray_mask,
                      lo, hi, resolution=128, n_samples=96, weight=1.0):
    v, e = carve_votes(ray_origins, ray_targets, ray_mask, lo, hi,
                       resolution=resolution, n_samples=n_samples,
                       weight=weight)
    return votes0 + v, evidence0 + e


@functools.partial(jax.jit, static_argnames=("resolution", "n_samples"))
def carve_votes(
    ray_origins: jnp.ndarray,   # [B,3] camera centers per constraint
    ray_targets: jnp.ndarray,   # [B,3] observed point per constraint
    ray_mask: jnp.ndarray,      # [B] active-constraint mask
    lo: jnp.ndarray,            # [3] grid lower corner
    hi: jnp.ndarray,            # [3] grid upper corner
    resolution: int = 128,
    n_samples: int = 96,
    weight: float = 1.0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """March all rays at once; returns (votes, evidence) grids [R,R,R].

    Free-space votes are deposited strictly *between* origin and target
    (t in [0, 0.97]) — the voxel containing the point itself is NOT carved,
    mirroring the tet walk stopping at the cell containing Q (``.cc:913-``).

    ``weight`` (traced scalar) scales every deposit: +1 adds constraints,
    -1 *retracts* previously added ones — the exact-cancellation primitive
    behind incremental re-carving (deposits are unit scatter-adds, so
    add-then-subtract of identical rays restores the grid bit-exactly in
    float32; the TPU analog of the reference's incremental tet updates,
    ``FreespaceDelaunayAlgorithm.cc:274-302``).
    """
    R = resolution
    scale = (hi - lo) / R
    w = jnp.asarray(weight, jnp.float32)

    # Sample positions along each ray: [B,S,3].  Samples run the FULL ray;
    # the voxel containing the target itself is excluded below.  (An earlier
    # fractional cutoff t<=0.97 under-carved by 3% of the ray length — a
    # ~2-voxel systematic surface bias vs the tet oracle at bench scale; the
    # tet walk's stopping rule is "the cell containing Q", i.e. exactly one
    # cell, not a ray-length fraction, ``.cc:913-``.)
    ts = jnp.linspace(0.02, 1.0, n_samples, dtype=ray_origins.dtype)
    pos = ray_origins[:, None, :] + ts[None, :, None] * (
        ray_targets - ray_origins
    )[:, None, :]
    idx = jnp.floor((pos - lo) / scale).astype(jnp.int32)       # [B,S,3]
    inb = jnp.all((idx >= 0) & (idx < R), axis=-1) & ray_mask[:, None]
    flat = (idx[..., 0] * R + idx[..., 1]) * R + idx[..., 2]     # [B,S]
    flat = jnp.where(inb, flat, R * R * R)                       # OOB -> dropped
    # Never carve the cell containing the observed point (tet-walk stop).
    # Only valid for in-bounds targets: an OOB index flattened with negative
    # or >=R components aliases an unrelated in-bounds voxel (e.g. (0,1,-2)
    # -> flat R-2 = voxel (0,0,R-2)) and would silently suppress its votes.
    tgt_idx = jnp.floor((ray_targets - lo) / scale).astype(jnp.int32)
    tgt_inb = jnp.all((tgt_idx >= 0) & (tgt_idx < R), axis=-1)
    tgt_flat = (tgt_idx[..., 0] * R + tgt_idx[..., 1]) * R + tgt_idx[..., 2]
    tgt_flat = jnp.where(tgt_inb, tgt_flat, R * R * R)
    flat = jnp.where(flat == tgt_flat[:, None], R * R * R, flat)

    # Deduplicate consecutive samples landing in the same voxel so each ray
    # votes a cell at most ~once (tet-walk semantics: one vote per crossed
    # cell).  A cheap shift-compare keeps only the first sample in a run.
    prev = jnp.concatenate([jnp.full_like(flat[:, :1], -1), flat[:, :-1]], axis=1)
    first = flat != prev
    flat = jnp.where(first, flat, R * R * R)

    votes = jnp.zeros((R * R * R,), jnp.float32).at[flat.reshape(-1)].add(
        w, mode="drop"
    )

    # Endpoint evidence (the Delaunay vertex / surface anchor).
    eidx = jnp.floor((ray_targets - lo) / scale).astype(jnp.int32)
    einb = jnp.all((eidx >= 0) & (eidx < R), axis=-1) & ray_mask
    eflat = (eidx[..., 0] * R + eidx[..., 1]) * R + eidx[..., 2]
    eflat = jnp.where(einb, eflat, R * R * R)
    evidence = jnp.zeros((R * R * R,), jnp.float32).at[eflat].add(w, mode="drop")

    return votes.reshape(R, R, R), evidence.reshape(R, R, R)


@functools.partial(jax.jit, static_argnames=("iterations",))
def mrf_relax(votes: jnp.ndarray, evidence: jnp.ndarray,
              lambda_smooth: float = 0.05, iterations: int = 16,
              free_threshold: float = 0.5) -> jnp.ndarray:
    """Free/occupied labelling via damped mean-field relaxation of the
    reference's min-cut energy.

    Replaces the BK max-flow over tet adjacency (``tetsToTris_maxFlowSimple``
    ``.cc:1517-1661``) with the SAME energy on the voxel graph: unary term =
    cell volume toward *free* if it has votes, toward *occupied* otherwise
    (``.cc:1568-1584``, P_constr_X0=1/P_no_constr_X1=1); pairwise term
    ``lambda_smooth`` x face area (the reference's 0.05, ``.cc:1579``)
    averaging the 6-neighborhood.  On a uniform voxel grid the unary weight
    (1.0) strictly dominates the total pairwise pull (6 x 0.05 = 0.3), so the
    exact min-cut labeling equals vote>0 thresholding and the damped Jacobi
    relaxation provably reproduces it sign-exactly — verified against
    scipy's exact max-flow in ``tests/test_mincut.py``.

    ``evidence`` (point-endpoint mass) does NOT enter the energy — the
    reference's data term is votes-only; evidence gates which boundary faces
    become surface (``boundary_faces``), mirroring the bounding-vertex facet
    exclusion (``.cc:1620-1640``).

    Returns a soft field in [-1, 1]; free space is field > 0.
    """
    del evidence  # face-gating only (boundary_faces); not part of the energy
    data = jnp.where(votes > free_threshold, 1.0, -1.0).astype(jnp.float32)

    def sweep(_, x):
        n = (
            jnp.roll(x, 1, 0) + jnp.roll(x, -1, 0)
            + jnp.roll(x, 1, 1) + jnp.roll(x, -1, 1)
            + jnp.roll(x, 1, 2) + jnp.roll(x, -1, 2)
        ) / 6.0
        return jnp.clip(
            (data + 6.0 * lambda_smooth * n) / (1.0 + 6.0 * lambda_smooth),
            -1.0, 1.0,
        )

    return jax.lax.fori_loop(0, iterations, sweep, data)


@functools.partial(jax.jit, static_argnames=("radius",))
def dilate_evidence(evidence: jnp.ndarray, radius: int = 2) -> jnp.ndarray:
    """3D max-pool dilation of the evidence grid — gates which free/unknown
    boundary faces become surface (the analog of excluding facets incident to
    bounding-box vertices, ``.cc:1620-1640``)."""
    x = (evidence > 0).astype(jnp.float32)
    for _ in range(radius):
        x = jnp.maximum(
            x,
            jnp.maximum(
                jnp.maximum(jnp.roll(x, 1, 0), jnp.roll(x, -1, 0)),
                jnp.maximum(
                    jnp.maximum(jnp.roll(x, 1, 1), jnp.roll(x, -1, 1)),
                    jnp.maximum(jnp.roll(x, 1, 2), jnp.roll(x, -1, 2)),
                ),
            ),
        )
    return x


@jax.jit
def boundary_faces(field: jnp.ndarray, evidence_dilated: jnp.ndarray):
    """Find free->non-free transitions along each axis, gated by evidence.

    Returns three boolean grids (fx, fy, fz): fx[i,j,k] marks a surface face
    between cell (i,j,k) and (i+1,j,k) (one grid per axis; last slice unused).
    A face is surface iff exactly one side is free AND the non-free side has
    dilated point evidence (suppresses frustum-boundary faces).
    """
    free = field > 0.0

    def axis_faces(ax):
        a = free
        b = jnp.roll(free, -1, ax)
        ev_a = evidence_dilated > 0
        ev_b = jnp.roll(evidence_dilated, -1, ax) > 0
        face = (a ^ b) & jnp.where(a, ev_b, ev_a)
        # Mask the wrapped last slice.
        n = free.shape[ax]
        idx = jax.lax.broadcasted_iota(jnp.int32, free.shape, ax)
        return face & (idx < n - 1)

    return axis_faces(0), axis_faces(1), axis_faces(2)


@functools.partial(jax.jit, static_argnames=("cap",))
def extract_face_cells(fx: jnp.ndarray, fy: jnp.ndarray, fz: jnp.ndarray,
                       cap: int):
    """Compact the boundary-face grids to index lists ON DEVICE.

    The host mesh builder previously pulled three full [R,R,R] bool grids
    (+ the field) over the tunnel (~14 MB per mesh at R=128); the surface
    occupies a tiny fraction of cells, so pull [cap,3] indices per axis
    instead (static shape via ``argwhere(size=...)``; overflow rows are
    dropped and reported via the returned counts).
    """
    def one(g):
        n = jnp.sum(g).astype(jnp.int32)
        c = jnp.argwhere(g, size=cap, fill_value=-1).astype(jnp.int32)
        return c, n

    cx, nx = one(fx)
    cy, ny = one(fy)
    cz, nz = one(fz)
    return (cx, cy, cz), jnp.stack([nx, ny, nz])
