"""Loop closing + relocalization service.

TPU re-design of ``LoopClosing`` (reference ``src/LoopClosing.cc``) and the
relocalization path (``Tracking.cc:1350-1511`` + ``KeyFrameDatabase.cc``):

- a device-resident BoW database ([K, W] vectors, ops/bow.py) replaces the
  DBoW2 inverted file; candidate retrieval is one masked matmul;
- ``DetectLoop`` (``LoopClosing.cc:103-229``): min-score gate from covisible
  neighbors, common-words filter, covisibility-consistency over consecutive
  keyframes;
- ``ComputeSim3`` (``:231-400``): descriptor matching between the two
  keyframes' point sets + batched Horn Sim3 RANSAC (ops/horn.py);
- ``CorrectLoop`` (``:402-584``): Sim3 propagation to the covisible group,
  point correction, essential-graph optimization (ops/posegraph.py), and a
  global BA (CG-Schur);
- ``Relocalization``: BoW candidates + batched PnP RANSAC (ops/pnp.py).
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from orb_slam_free_space_carving_tpu.config import SystemConfig
from orb_slam_free_space_carving_tpu.models import map_state as ms
from orb_slam_free_space_carving_tpu.ops import bow, horn, matching, pnp
from orb_slam_free_space_carving_tpu.utils import camera, lie


class LoopCloser:
    def __init__(self, cfg: SystemConfig, map_arrays_ref, map_host: ms.MapHost):
        self.cfg = cfg
        self._map_ref = map_arrays_ref
        self.host = map_host
        self.local_mapper = None
        self.intr = camera.intrinsics_array(cfg.camera)
        W = cfg.loop.vocab_words
        K = cfg.capacity.max_keyframes
        self._codebook = jnp.asarray(bow.codebook(W, cfg.loop.vocab_seed))
        self.bow_db = jnp.zeros((K, W), jnp.float32)
        self.bow_mask = np.zeros(K, bool)
        self.key = jax.random.PRNGKey(cfg.seed + 1)
        self.consistent_groups: List[Tuple[set, int]] = []
        self.last_loop_kf = -10**9
        self.n_loops_closed = 0

    @property
    def m(self) -> ms.MapArrays:
        return self._map_ref[0]

    @m.setter
    def m(self, v):
        self._map_ref[0] = v

    def reset(self):
        self.bow_db = jnp.zeros_like(self.bow_db)
        self.bow_mask[:] = False
        self.consistent_groups = []
        self.last_loop_kf = -10**9

    def _next_key(self):
        self.key, k = jax.random.split(self.key)
        return k

    def rebuild_database(self):
        """Recompute BoW vectors for every valid keyframe from the stored
        descriptors (used after :meth:`System.load_map`)."""
        m = self.m
        self.reset()
        for kf in np.where(self.host.kf_valid)[0]:
            vec = bow.bow_vector(
                m.kf_desc[int(kf)], m.kf_feat_valid[int(kf)], self._codebook,
                n_words=self.cfg.loop.vocab_words,
            )
            self.bow_db = self.bow_db.at[int(kf)].set(vec)
            self.bow_mask[int(kf)] = True

    # ------------------------------------------------------------------
    def on_keyframe(self, kf: int):
        m = self.m
        vec = bow.bow_vector(
            m.kf_desc[kf], m.kf_feat_valid[kf], self._codebook,
            n_words=self.cfg.loop.vocab_words,
        )
        self.bow_db = self.bow_db.at[kf].set(vec)
        self.bow_mask[kf] = True
        self._detect_and_close(kf, vec)

    # ------------------------------------------------------------------
    # Loop detection (LoopClosing.cc:103-229)
    # ------------------------------------------------------------------
    def _detect_and_close(self, kf: int, vec):
        host = self.host
        n_kf = int(host.kf_valid.sum())
        if n_kf < 10 or kf - 0 < 10:
            return
        # Cooldown: reference skips detection within 10 KFs of last loop (:110).
        if self.host.kf_frame_id[kf] - self.last_loop_kf < 10:
            return

        covis = host.covisible_keyframes(kf, 30, min_weight=15)
        mask = np.asarray(self.bow_mask).copy()
        mask[kf] = False
        # Exclude the covisible neighborhood from candidacy (:137-139).
        cand_mask = mask.copy()
        cand_mask[covis] = False
        # Also exclude recent keyframes (temporal neighbors).
        recent = np.abs(host.kf_frame_id[: len(cand_mask)] - host.kf_frame_id[kf]) < 30
        cand_mask[recent[: len(cand_mask)]] = False
        if not cand_mask.any():
            return

        scores = np.asarray(
            bow.bow_l1_scores(vec, self.bow_db, jnp.asarray(mask))
        )
        min_score = scores[covis].min() if covis.size else 0.05
        min_score = max(min_score, 0.0)

        cw = np.asarray(
            bow.common_word_counts(vec, self.bow_db, jnp.asarray(cand_mask))
        )
        if cw.max() <= 0:
            return
        ok = cand_mask & (scores >= min_score) & (
            cw > self.cfg.loop.min_common_words_ratio * cw.max()
        )
        cand = np.where(ok)[0]
        if cand.size == 0:
            self.consistent_groups = []
            return

        # Covisibility-consistency over consecutive KFs (:152-225).
        enough = []
        new_groups: List[Tuple[set, int]] = []
        for c in cand:
            group = set(host.covisible_keyframes(int(c), 30, min_weight=15).tolist())
            group.add(int(c))
            best = 0
            for prev_group, cnt in self.consistent_groups:
                if group & prev_group:
                    best = max(best, cnt + 1)
            new_groups.append((group, best))
            if best >= self.cfg.loop.covisibility_consistency_th:
                enough.append(int(c))
        self.consistent_groups = new_groups
        if not enough:
            return

        for cand_kf in enough[:1]:
            if self._compute_sim3_and_correct(kf, cand_kf):
                self.last_loop_kf = self.host.kf_frame_id[kf]
                self.consistent_groups = []
                return

    # ------------------------------------------------------------------
    def _compute_sim3_and_correct(self, kf: int, cand: int) -> bool:
        """ComputeSim3 (:231-400) + CorrectLoop (:402-584)."""
        m = self.m
        host = self.host
        # Match points bound to features in both keyframes via descriptors.
        obs1 = host.obs_pt[kf]
        obs2 = host.obs_pt[cand]
        f1 = np.where(obs1 >= 0)[0]
        f2 = np.where(obs2 >= 0)[0]
        if f1.size < 20 or f2.size < 20:
            return False
        d1 = m.kf_desc[kf][jnp.asarray(f1)]
        d2 = m.kf_desc[cand][jnp.asarray(f2)]
        dist = matching.hamming_matrix(d1, d2)
        idx, best = matching.masked_match(
            dist, jnp.ones(dist.shape, bool), max_dist=50.0, ratio=0.75
        )
        idx_np = np.asarray(idx)
        rows = np.where(idx_np >= 0)[0]
        if rows.size < self.cfg.loop.min_bow_matches:
            return False
        p1_ids = obs1[f1[rows]]
        p2_ids = obs2[f2[idx_np[rows]]]

        # 3D points in each camera frame.
        xyz = np.asarray(m.pt_xyz)
        x1w = xyz[p1_ids]
        x2w = xyz[p2_ids]
        pose1 = m.kf_pose[kf]
        pose2 = m.kf_pose[cand]
        x1c = np.asarray(lie.se3_apply(pose1, jnp.asarray(x1w)))
        x2c = np.asarray(lie.se3_apply(pose2, jnp.asarray(x2w)))

        # Pad to static capacity.
        CAP = 512
        n = min(rows.size, CAP)
        x1p = np.zeros((CAP, 3), np.float32)
        x2p = np.zeros((CAP, 3), np.float32)
        mk = np.zeros(CAP, bool)
        x1p[:n] = x1c[:n]
        x2p[:n] = x2c[:n]
        mk[:n] = True
        res = horn.solve_sim3_ransac(
            jnp.asarray(x1p), jnp.asarray(x2p), jnp.asarray(mk), self.intr,
            self._next_key(), min_inliers=self.cfg.loop.min_sim3_inliers,
        )
        if not bool(res.ok):
            return False

        self._correct_loop(kf, cand, res.sim_12)
        return True

    # ------------------------------------------------------------------
    def _correct_loop(self, kf: int, cand: int, sim_12):
        """CorrectLoop (:402-584): propagate the Sim3 correction through the
        covisible group, then optimize the essential graph over all keyframes
        and re-scale point positions."""
        from orb_slam_free_space_carving_tpu.ops import posegraph

        m = self.m
        host = self.host

        # Corrected pose of kf: T_kf_w_corrected = Sim(cand->kf measured) o T_cand_w.
        # sim_12 maps cand-camera coords into kf-camera coords (x1 = S12 x2).
        S12 = sim_12
        pose_cand = lie.sim3_from_se3(m.kf_pose[cand])
        S_kf_corr = lie.sim3_compose(S12, pose_cand)   # corrected Sim3 Tcw of kf

        # Pose-graph optimize all valid keyframes.
        K = self.cfg.capacity.max_keyframes
        valid = host.kf_valid.copy()
        poses7 = m.kf_pose

        # Build edge list (host): spanning tree + strong covisibility + loop.
        edges_i, edges_j = [], []
        for k in range(host.n_kf_slots):
            if not valid[k]:
                continue
            p = host.parent[k]
            if p >= 0 and valid[p]:
                edges_i.append(k)
                edges_j.append(int(p))
        strong = np.argwhere(
            host.covis >= self.cfg.optimizer.essential_graph_min_feat
        )
        for i, j in strong:
            if i < j and valid[i] and valid[j]:
                edges_i.append(int(i))
                edges_j.append(int(j))
        for i, js in host.loop_edges.items():
            for j in js:
                edges_i.append(int(i))
                edges_j.append(int(j))
        edges_i.append(kf)
        edges_j.append(cand)

        sims = lie.sim3_from_se3(poses7)               # [K,8]
        sims = sims.at[kf].set(S_kf_corr)

        # Measured relative transforms from pre-correction poses; the loop edge
        # (last) uses the Sim3 measurement.
        rel = []
        for i, j in zip(edges_i, edges_j):
            Si = lie.sim3_from_se3(poses7[i])
            Sj = lie.sim3_from_se3(poses7[j])
            rel.append(lie.sim3_compose(Si, lie.sim3_inverse(Sj)))
        rel[-1] = lie.sim3_compose(S_kf_corr, lie.sim3_inverse(
            lie.sim3_from_se3(poses7[cand])
        ))
        E = len(edges_i)
        CAP_E = 1 << int(np.ceil(np.log2(max(E, 64))))
        ei = np.zeros(CAP_E, np.int32)
        ej = np.zeros(CAP_E, np.int32)
        emask = np.zeros(CAP_E, bool)
        ei[:E] = edges_i
        ej[:E] = edges_j
        emask[:E] = True
        rel_pad = jnp.concatenate(
            [jnp.stack(rel)] + [lie.sim3_identity((CAP_E - E,))]
            if E < CAP_E else [jnp.stack(rel)]
        )

        fixed = np.zeros(K, bool)
        fixed[cand] = True
        fixed[~valid] = True

        new_sims = posegraph.optimize_essential_graph(
            sims, jnp.asarray(ei), jnp.asarray(ej), rel_pad,
            jnp.asarray(emask), jnp.asarray(fixed),
            iterations=self.cfg.optimizer.essential_graph_iterations,
        )

        # Correct point positions through their reference keyframe's motion
        # (LoopClosing.cc:476-508): p' = S_new^-1 (S_old (p)).
        pt_ref = np.asarray(m.pt_ref_kf)
        pt_valid = np.asarray(m.pt_valid)
        old_sims = lie.sim3_from_se3(poses7)
        ref_idx = jnp.asarray(np.where(pt_valid, pt_ref, 0))
        S_old = old_sims[ref_idx]
        S_new = new_sims[ref_idx]
        p_cam = lie.sim3_apply(S_old, m.pt_xyz)
        p_new = lie.sim3_apply(jax.vmap(lie.sim3_inverse)(S_new), p_cam)
        new_xyz = jnp.where(jnp.asarray(pt_valid)[:, None], p_new, m.pt_xyz)

        new_poses = lie.sim3_to_se3(new_sims)
        new_poses = jnp.where(jnp.asarray(valid)[:, None], new_poses, m.kf_pose)
        self.m = m._replace(kf_pose=new_poses, pt_xyz=new_xyz)
        self.m = ms.update_point_stats(self.m)

        host.loop_edges.setdefault(kf, set()).add(cand)
        host.big_change_idx += 1
        self.n_loops_closed += 1

        # CARV adjustment event for the global correction.
        pids = np.where(pt_valid)[0]
        centers = np.asarray(lie.se3_inverse(new_poses))[:, 4:7]
        kfs = np.where(valid)[0]
        host.journal.append(ms.JournalEvent(
            kind="adjust",
            moved_ids=pids, moved_xyz=np.asarray(new_xyz)[pids],
            moved_kfs=kfs, moved_centers=centers[kfs],
        ))

    # ------------------------------------------------------------------
    # Relocalization (Tracking.cc:1350-1511)
    # ------------------------------------------------------------------
    def relocalize(self, frame) -> Tuple[bool, np.ndarray, jnp.ndarray]:
        track_pt = np.full(frame.feat.capacity, -1, np.int32)
        if not self.bow_mask.any():
            return False, track_pt, frame.pose
        m = self.m
        vec = bow.bow_vector(
            frame.feat.desc, frame.feat.valid, self._codebook,
            n_words=self.cfg.loop.vocab_words,
        )
        scores = np.asarray(
            bow.bow_l1_scores(vec, self.bow_db, jnp.asarray(self.bow_mask))
        )
        cands = np.argsort(-scores)[: self.cfg.tracking.reloc_max_candidates]
        for kf in cands:
            kf = int(kf)
            if scores[kf] <= 0:
                break
            obs = self.host.obs_pt[kf]
            feats = np.where(obs >= 0)[0]
            if feats.size < 15:
                continue
            pids = obs[feats]
            pt_desc = m.pt_desc[jnp.asarray(pids)]
            dist = matching.hamming_matrix(pt_desc, frame.feat.desc)
            mask = jnp.ones(dist.shape, bool) & frame.feat.valid[None, :]
            idx, best = matching.masked_match(dist, mask, max_dist=50.0, ratio=0.75)
            idx_np = np.asarray(idx)
            rows = np.where(idx_np >= 0)[0]
            if rows.size < 15:
                continue
            CAP = 512
            n = min(rows.size, CAP)
            ptsw = np.zeros((CAP, 3), np.float32)
            uv = np.zeros((CAP, 2), np.float32)
            mk = np.zeros(CAP, bool)
            xyz = np.asarray(m.pt_xyz)
            uv_np = np.asarray(frame.feat.uv_und)
            ptsw[:n] = xyz[pids[rows[:n]]]
            uv[:n] = uv_np[idx_np[rows[:n]]]
            mk[:n] = True
            res = pnp.solve_pnp_ransac(
                jnp.asarray(ptsw), jnp.asarray(uv), jnp.asarray(mk),
                self.intr, self._next_key(),
                min_inliers=max(15, self.cfg.tracking.min_matches_after_reloc // 2),
            )
            if bool(res.ok):
                inl = np.asarray(res.inliers)
                for r in range(n):
                    if inl[r]:
                        track_pt[idx_np[rows[r]]] = pids[rows[r]]
                return True, track_pt, res.pose
        return False, track_pt, frame.pose
