"""Carving kernel tests on hand-built scenes with known free space.

The analog of the reference's (absent) CARV validation: closed-form scenes
where the carved free-space region and surface location are known exactly
(SURVEY.md section 4 recommends "carving on hand-built 4-tet scenes"; the
voxel recast uses a hand-built room instead).
"""

import jax
import jax.numpy as jnp
import numpy as np

from orb_slam_free_space_carving_tpu.ops import carving


def _wall_scene(n_pts=400, wall_z=4.0, extent=2.0, seed=0):
    """Camera at origin looking at a wall of points at z=wall_z."""
    rng = np.random.default_rng(seed)
    pts = np.stack(
        [
            rng.uniform(-extent, extent, n_pts),
            rng.uniform(-extent, extent, n_pts),
            np.full(n_pts, wall_z),
        ],
        axis=-1,
    ).astype(np.float32)
    origins = np.zeros((n_pts, 3), np.float32)
    return origins, pts


class TestCarveVotes:
    def test_free_space_between_camera_and_wall(self):
        origins, targets = _wall_scene()
        lo = jnp.asarray([-2.5, -2.5, -0.5])
        hi = jnp.asarray([2.5, 2.5, 4.5])
        votes, evidence = carving.carve_votes(
            jnp.asarray(origins), jnp.asarray(targets),
            jnp.ones(len(origins), bool), lo, hi,
            resolution=32, n_samples=64,
        )
        votes = np.asarray(votes)
        evidence = np.asarray(evidence)
        R = 32
        scale = np.asarray((hi - lo)) / R

        def cell(p):
            return tuple(((np.asarray(p) - np.asarray(lo)) / scale).astype(int))

        # Midpoint between camera and wall center: free (has votes).
        assert votes[cell([0, 0, 2.0])] > 0
        # Behind the wall: never carved.
        assert votes[cell([0, 0, 4.3])] == 0
        # Wall cells carry endpoint evidence.
        assert evidence[:, :, cell([0, 0, 4.0])[2]].sum() > 300

    def test_votes_respect_mask(self):
        origins, targets = _wall_scene(n_pts=100)
        lo = jnp.asarray([-2.5, -2.5, -0.5])
        hi = jnp.asarray([2.5, 2.5, 4.5])
        votes, _ = carving.carve_votes(
            jnp.asarray(origins), jnp.asarray(targets),
            jnp.zeros(100, bool), lo, hi, resolution=16, n_samples=16,
        )
        assert float(jnp.sum(votes)) == 0.0

    def test_deleted_constraints_uncarve(self):
        """Semantics parity with removeVertex/removeConstraint re-marking
        (FreespaceDelaunayAlgorithm.cc:305-369): recomputing with a constraint
        removed leaves the affected region unvoted."""
        origins, targets = _wall_scene(n_pts=1)
        lo = jnp.asarray([-2.5, -2.5, -0.5])
        hi = jnp.asarray([2.5, 2.5, 4.5])
        v1, _ = carving.carve_votes(
            jnp.asarray(origins), jnp.asarray(targets), jnp.ones(1, bool),
            lo, hi, resolution=16, n_samples=32,
        )
        v0, _ = carving.carve_votes(
            jnp.asarray(origins), jnp.asarray(targets), jnp.zeros(1, bool),
            lo, hi, resolution=16, n_samples=32,
        )
        assert float(v1.sum()) > 0 and float(v0.sum()) == 0


class TestMRF:
    def test_relax_smooths_isolated_votes(self):
        votes = jnp.zeros((16, 16, 16)).at[8, 8, 8].set(5.0)
        ev = jnp.zeros((16, 16, 16))
        field = carving.mrf_relax(votes, ev, lambda_smooth=0.05, iterations=8)
        f = np.asarray(field)
        assert f[8, 8, 8] > 0          # voted cell stays free
        # Reference energy (.cc:1568-1584): cells with no votes are INSIDE
        # (occupied) — unknown space is not carved.
        assert f[0, 0, 0] < 0

    def test_evidence_pushes_occupied(self):
        votes = jnp.zeros((8, 8, 8))
        ev = jnp.zeros((8, 8, 8)).at[4, 4, 4].set(3.0)
        field = carving.mrf_relax(votes, ev, iterations=4)
        assert float(field[4, 4, 4]) < 0


class TestBoundaryFaces:
    def test_wall_surface_found_at_wall(self):
        """Full kernel chain on the wall scene: the extracted boundary sits in
        the wall's voxel slab and nowhere far from evidence."""
        origins, targets = _wall_scene()
        lo = jnp.asarray([-2.5, -2.5, -0.5])
        hi = jnp.asarray([2.5, 2.5, 4.5])
        votes, ev = carving.carve_votes(
            jnp.asarray(origins), jnp.asarray(targets),
            jnp.ones(len(origins), bool), lo, hi,
            resolution=32, n_samples=64,
        )
        field = carving.mrf_relax(votes, ev, iterations=8)
        evd = carving.dilate_evidence(ev, radius=1)
        fx, fy, fz = carving.boundary_faces(field, evd)
        fz = np.asarray(fz)
        # The wall plane z=4.0 maps to voxel k = (4.0+0.5)/5*32 = 28.8 -> 28.
        ks = np.where(fz.any(axis=(0, 1)))[0]
        assert ks.size > 0
        assert ks.min() >= 26 and ks.max() <= 30, f"surface at slabs {ks}"


class TestBow:
    def test_same_place_scores_higher(self, rng):
        from orb_slam_free_space_carving_tpu.ops import bow

        cb = jnp.asarray(bow.codebook(512, 7))
        descA = rng.integers(0, 256, (200, 32)).astype(np.uint8)
        # Same place seen again: 90% same descriptors with a few bit flips.
        descA2 = descA.copy()
        flips = rng.integers(0, 256, (200, 32)).astype(np.uint8)
        descA2 = np.where(rng.random((200, 32)) < 0.05, descA ^ flips, descA)
        descB = rng.integers(0, 256, (200, 32)).astype(np.uint8)

        valid = jnp.ones(200, bool)
        vA = bow.bow_vector(jnp.asarray(descA), valid, cb, n_words=512)
        vA2 = bow.bow_vector(jnp.asarray(descA2), valid, cb, n_words=512)
        vB = bow.bow_vector(jnp.asarray(descB), valid, cb, n_words=512)
        db = jnp.stack([vA2, vB])
        s = np.asarray(bow.bow_l1_scores(vA, db, jnp.ones(2, bool)))
        assert s[0] > 2.0 * s[1], s

    def test_common_words(self, rng):
        from orb_slam_free_space_carving_tpu.ops import bow

        cb = jnp.asarray(bow.codebook(256, 7))
        d1 = rng.integers(0, 256, (100, 32)).astype(np.uint8)
        valid = jnp.ones(100, bool)
        v1 = bow.bow_vector(jnp.asarray(d1), valid, cb, n_words=256)
        cw = np.asarray(
            bow.common_word_counts(v1, v1[None, :], jnp.ones(1, bool))
        )
        assert cw[0] == float((np.asarray(v1) > 0).sum())
