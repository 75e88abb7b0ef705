// Native map-structure store: the host-side bookkeeping engine.
//
// TPU-native counterpart of the reference's C++ map data model
// (reference src/Map.cc, src/KeyFrame.cc covisibility machinery,
// src/MapPoint.cc observation maps): the *numeric* map lives on the TPU as
// device arrays (models/map_state.py); the *structural* bookkeeping — the
// feature->point observation table, covisibility counts, spanning tree,
// per-point observation counts, local-map point selection — is dense integer
// scanning that belongs on the host, and at K x N = 512 x 1024 slots per scan
// it is worth native code (the reference keeps exactly this in C++ too).
//
// Exposed as a plain C ABI for ctypes (no pybind11 in the image).
// All buffers are caller-owned numpy arrays; the store never allocates
// python-visible memory.

#include <cstdint>
#include <cstring>
#include <algorithm>
#include <vector>

extern "C" {

// Covisibility row: for keyframe `kf`, count shared observed points with
// every other valid keyframe.  obs: [K,N] int32 (point id or -1).
// Replaces KeyFrame::UpdateConnections' map-counting loop
// (reference src/KeyFrame.cc:289-379).
void covisibility_row(const int32_t* obs, const uint8_t* kf_valid,
                      int64_t K, int64_t N, int64_t M, int64_t kf,
                      int32_t* out_counts /* [K] */) {
    std::vector<uint8_t> pt_mask(M, 0);
    const int32_t* own = obs + kf * N;
    for (int64_t f = 0; f < N; ++f) {
        int32_t p = own[f];
        if (p >= 0 && p < M) pt_mask[p] = 1;
    }
    for (int64_t k = 0; k < K; ++k) {
        int32_t c = 0;
        if (k != kf && kf_valid[k]) {
            const int32_t* row = obs + k * N;
            for (int64_t f = 0; f < N; ++f) {
                int32_t p = row[f];
                if (p >= 0 && p < M && pt_mask[p]) ++c;
            }
        }
        out_counts[k] = c;
    }
}

// Observation count per point over all valid keyframes (bincount).
// Replaces per-point MapPoint::Observations() scans.
void obs_counts(const int32_t* obs, const uint8_t* kf_valid,
                int64_t K, int64_t N, int64_t M,
                int32_t* out_counts /* [M] */) {
    std::memset(out_counts, 0, sizeof(int32_t) * M);
    for (int64_t k = 0; k < K; ++k) {
        if (!kf_valid[k]) continue;
        const int32_t* row = obs + k * N;
        for (int64_t f = 0; f < N; ++f) {
            int32_t p = row[f];
            if (p >= 0 && p < M) ++out_counts[p];
        }
    }
}

// Unique valid point ids observed by a set of keyframes, up to `cap`.
// Replaces Tracking::UpdateLocalPoints (reference src/Tracking.cc:1204-1253).
// Returns the number of ids written.
int64_t local_point_ids(const int32_t* obs, int64_t N, int64_t M,
                        const int32_t* kfs, int64_t n_kfs,
                        const uint8_t* pt_valid,
                        int32_t* out_ids, int64_t cap) {
    std::vector<uint8_t> seen(M, 0);
    int64_t n = 0;
    for (int64_t i = 0; i < n_kfs && n < cap; ++i) {
        const int32_t* row = obs + (int64_t)kfs[i] * N;
        for (int64_t f = 0; f < N && n < cap; ++f) {
            int32_t p = row[f];
            if (p >= 0 && p < M && !seen[p] && pt_valid[p]) {
                seen[p] = 1;
                out_ids[n++] = p;
            }
        }
    }
    return n;
}

// Keyframes observing ANY of the given point ids (early-exit per row).
// Replaces Tracking::UpdateLocalKeyFrames' vote-counting scan
// (reference src/Tracking.cc:1255-1348) — the python np.isin over the
// whole K x N table was O(map) per slow frame.
int64_t kfs_observing(const int32_t* obs, const uint8_t* kf_valid,
                      int64_t K, int64_t N, int64_t M,
                      const int32_t* pids, int64_t n_pids,
                      int32_t* out_kfs, int64_t cap) {
    std::vector<uint8_t> pt_mask(M, 0);
    for (int64_t i = 0; i < n_pids; ++i) {
        int32_t p = pids[i];
        if (p >= 0 && p < M) pt_mask[p] = 1;
    }
    int64_t n = 0;
    for (int64_t k = 0; k < K && n < cap; ++k) {
        if (!kf_valid[k]) continue;
        const int32_t* row = obs + k * N;
        for (int64_t f = 0; f < N; ++f) {
            int32_t p = row[f];
            if (p >= 0 && p < M && pt_mask[p]) {
                out_kfs[n++] = (int32_t)k;
                break;
            }
        }
    }
    return n;
}

// Keyframes observing the given point ids, ranked by SHARED-OBSERVATION
// COUNT (descending) up to `cap`.  The reference's UpdateLocalKeyFrames
// keeps the keyframes sharing the MOST points (src/Tracking.cc:1255-1348);
// the early-exit variant above truncates in slot order, which can keep
// low-overlap early slots over high-overlap late ones once more than `cap`
// keyframes observe the tracked set (advisor r4).
int64_t kfs_observing_top(const int32_t* obs, const uint8_t* kf_valid,
                          int64_t K, int64_t N, int64_t M,
                          const int32_t* pids, int64_t n_pids,
                          int32_t* out_kfs, int64_t cap) {
    std::vector<uint8_t> pt_mask(M, 0);
    for (int64_t i = 0; i < n_pids; ++i) {
        int32_t p = pids[i];
        if (p >= 0 && p < M) pt_mask[p] = 1;
    }
    std::vector<std::pair<int32_t, int32_t>> hits;  // (-count, kf)
    for (int64_t k = 0; k < K; ++k) {
        if (!kf_valid[k]) continue;
        const int32_t* row = obs + k * N;
        int32_t c = 0;
        for (int64_t f = 0; f < N; ++f) {
            int32_t p = row[f];
            if (p >= 0 && p < M && pt_mask[p]) ++c;
        }
        if (c > 0) hits.emplace_back(-c, (int32_t)k);
    }
    int64_t n = std::min<int64_t>(cap, (int64_t)hits.size());
    std::partial_sort(hits.begin(), hits.begin() + n, hits.end());
    for (int64_t i = 0; i < n; ++i) out_kfs[i] = hits[i].second;
    return n;
}

// Find all (kf, feat) pairs observing a given point id.
// Returns count; pairs written as kf,feat interleaved.
int64_t point_observations(const int32_t* obs, int64_t K, int64_t N,
                           int32_t pid, int32_t* out_pairs, int64_t cap) {
    int64_t n = 0;
    for (int64_t k = 0; k < K && n < cap; ++k) {
        const int32_t* row = obs + k * N;
        for (int64_t f = 0; f < N && n < cap; ++f) {
            if (row[f] == pid) {
                out_pairs[2 * n] = (int32_t)k;
                out_pairs[2 * n + 1] = (int32_t)f;
                ++n;
            }
        }
    }
    return n;
}

}  // extern "C"
