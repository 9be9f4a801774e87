"""Ray marching: lattice vs sequential recurrence, compaction, compositing
vs a direct per-ray reference, Morton codes, mip selection."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ngp_tpu.common import (MAX_CONE_STEPSIZE, MIN_CONE_STEPSIZE,
                            NERF_GRIDSIZE)
from ngp_tpu.grid.occupancy import (cell_idx_at, mip_from_dt, mip_from_pos,
                                    morton3d, morton3d_invert)
from ngp_tpu.rays.marching import (compact_samples, composite_samples,
                                   step_lattice)


def test_lattice_matches_sequential_recurrence():
    cone = 1.0 / 256.0
    t0s = np.array([0.01, 0.3, 1.7, 5.0, 40.0], np.float32)
    K = 300
    lat = np.asarray(step_lattice(jnp.asarray(t0s), cone, K))
    for r, t0 in enumerate(t0s):
        t = t0
        for k in range(K):
            np.testing.assert_allclose(lat[r, k], t, rtol=2e-4,
                                       err_msg=f"ray {r} step {k}")
            t = t + np.clip(t * cone, MIN_CONE_STEPSIZE, MAX_CONE_STEPSIZE)


def test_lattice_zero_cone_uniform():
    lat = np.asarray(step_lattice(jnp.asarray([0.5]), 0.0, 10))
    np.testing.assert_allclose(np.diff(lat[0]), MIN_CONE_STEPSIZE, rtol=1e-4)


def test_morton_roundtrip():
    idx = jnp.arange(NERF_GRIDSIZE ** 3, dtype=jnp.uint32)[:: 997]
    x, y, z = morton3d_invert(idx)
    back = morton3d(x, y, z)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(idx))


def test_mip_from_pos():
    pos = jnp.asarray([[0.5, 0.5, 0.5], [0.9, 0.5, 0.5],
                       [1.4, 0.5, 0.5], [2.4, 0.5, 0.5]])
    mips = np.asarray(mip_from_pos(pos, 7))
    # |p-0.5|max: 0 → mip0; 0.4 → frexp(0.4)=-1 → mip0; 0.9 → 0 → mip1;
    # 1.9 → 1 → mip2
    np.testing.assert_array_equal(mips, [0, 0, 1, 2])


@pytest.mark.smoke
def test_compaction_preserves_ray_major_order():
    R, K = 4, 8
    rng = np.random.default_rng(0)
    emit = jnp.asarray(rng.random((R, K)) > 0.5)
    t = jnp.asarray(np.arange(R * K, dtype=np.float32).reshape(R, K))
    dt = t * 0.1
    s_t, s_dt, s_ray, counts, offsets, fits, total, s_k = compact_samples(
        t, dt, emit, R, 32)
    s_t, s_ray = np.asarray(s_t), np.asarray(s_ray)
    n = int(total)
    # ray ids nondecreasing, t increasing within segments
    assert all(s_ray[i] <= s_ray[i + 1] for i in range(n - 1))
    for r in range(R):
        seg = s_t[int(offsets[r]): int(offsets[r]) + int(counts[r])]
        assert np.all(np.diff(seg) > 0)
    assert n == int(np.asarray(emit).sum())


@pytest.mark.smoke
def test_compaction_overflow_drops_suffix_rays():
    R, K = 4, 8
    emit = jnp.ones((R, K), bool)
    t = jnp.zeros((R, K))
    s_t, s_dt, s_ray, counts, offsets, fits, total, s_k = compact_samples(
        t, t, emit, R, 20)  # capacity 20 < 32 → rays 0,1 fit (16), ray 2 not
    fits = np.asarray(fits)
    assert fits.tolist() == [True, True, False, False]


def test_composite_matches_reference_math():
    """Compare against a direct per-ray loop of the reference's
    compositing (alpha = 1-exp(-σΔt), w = T·α)."""
    rng = np.random.default_rng(1)
    R = 3
    counts = np.array([5, 0, 7])
    S = 16
    offsets = np.concatenate([[0], np.cumsum(counts)[:-1]])
    ray_id = np.full(S, R, np.int32)
    for r in range(R):
        ray_id[offsets[r]: offsets[r] + counts[r]] = r
    sigma = rng.random(S).astype(np.float32) * 20
    rgb = rng.random((S, 3)).astype(np.float32)
    dt = rng.random(S).astype(np.float32) * 0.01

    got_rgb, got_op, w = composite_samples(
        jnp.asarray(sigma), jnp.asarray(rgb), jnp.asarray(dt),
        jnp.asarray(ray_id), jnp.asarray(offsets.astype(np.int32)),
        jnp.asarray(counts.astype(np.int32)), R)

    for r in range(R):
        T, acc = 1.0, np.zeros(3)
        for i in range(offsets[r], offsets[r] + counts[r]):
            alpha = 1.0 - np.exp(-sigma[i] * dt[i])
            acc += T * alpha * rgb[i]
            T *= 1.0 - alpha
        np.testing.assert_allclose(np.asarray(got_rgb)[r], acc, rtol=2e-5,
                                   atol=1e-6)
        np.testing.assert_allclose(np.asarray(got_op)[r], 1.0 - T, rtol=2e-5,
                                   atol=1e-6)


@pytest.mark.smoke
def test_occupancy_bitfield_lookup():
    from ngp_tpu.grid.occupancy import (OccupancyGrid, init_grid,
                                        rebuild_bitfield, occupied_at,
                                        GRID_VOLUME)
    grid = init_grid(0)
    # occupy one known cell at level 0: center cell (64,64,64) — linear
    # (z,y,x) layout
    m = (64 * 128 + 64) * 128 + 64
    density = grid.density.at[m].set(1.0)
    grid = rebuild_bitfield(grid._replace(density=density), 0)
    pos = jnp.asarray([[64.5 / 128, 64.5 / 128, 64.5 / 128],
                       [10.5 / 128, 10.5 / 128, 10.5 / 128]])
    occ = np.asarray(occupied_at(grid.bitfield, pos,
                                 jnp.zeros(2, jnp.int32)))
    assert occ.tolist() == [True, False]


def test_exclusive_depth_matches_f64_and_survives_huge_sigma():
    """Per-ray lattice prefix must stay exact where T matters even when
    per-sample optical depth is extreme (global-stream f32 cumsum broke
    at ~1e7 accumulated depth and diverged fox training at ~3.5k steps)."""
    import numpy as np
    import jax.numpy as jnp
    from ngp_tpu.rays.marching import exclusive_depth

    rng = np.random.default_rng(0)
    R, K = 64, 128
    # stream: each ray has a contiguous run of samples with huge sdt
    counts = rng.integers(10, K, R)
    s_ray, s_k, sdt = [], [], []
    for r in range(R):
        ks = np.sort(rng.choice(K, counts[r], replace=False))
        s_ray += [r] * counts[r]
        s_k += list(ks)
        sdt += list(rng.random(counts[r]) * 5e6)   # extreme σ·Δt
    S = len(s_ray)
    s_ray = np.asarray(s_ray, np.int32)
    s_k = np.asarray(s_k, np.int32)
    sdt = np.asarray(sdt, np.float32)

    got = np.asarray(exclusive_depth(jnp.asarray(sdt), jnp.asarray(s_ray),
                                     jnp.asarray(s_k), R, K))
    # f64 per-ray reference
    ref = np.zeros(S)
    for r in range(R):
        m = s_ray == r
        ref[m] = np.cumsum(sdt[m].astype(np.float64)) - sdt[m]
    assert (got >= 0).all()
    # exact where the prefix is small enough for T to matter
    small = ref < 100.0
    np.testing.assert_allclose(got[small], ref[small], rtol=1e-5)


def test_compaction_search_branch_matches_scatter_branch():
    """compact_samples picks a stream-sized binary search when
    S ≪ lattice (the render-body regime — XLA TPU scatters are sized by
    the SOURCE); both branches must agree on every valid slot."""
    import jax.numpy as jnp
    import numpy as np
    from ngp_tpu.rays.marching import compact_samples

    rng = np.random.default_rng(7)
    R, K = 32, 256
    t = jnp.asarray(rng.random((R, K), np.float32).cumsum(1))
    dt = jnp.asarray(rng.random((R, K), np.float32))
    emit = jnp.asarray(rng.random((R, K)) < 0.02)

    def run(S):
        return [np.asarray(x) for x in compact_samples(t, dt, emit, R, S)]

    # S=256: 256*16 ≤ 8192 → search branch; S=4096: scatter branch.
    # Compare the search result against the scatter result truncated to
    # the same capacity semantics (same kept-ray prefix here: total<256).
    total = int(np.asarray(emit).sum())
    assert total < 256, "tune the density so both capacities fit all rays"
    a = run(256)
    b = run(4096)
    n_kept = total
    for i, name in ((0, "t"), (1, "dt"), (2, "ray"), (7, "k")):
        np.testing.assert_array_equal(a[i][:n_kept], b[i][:n_kept],
                                      err_msg=name)
    np.testing.assert_array_equal(a[3], b[3])   # counts
    np.testing.assert_array_equal(a[4], b[4])   # offsets
    assert int(a[6]) == int(b[6]) == total
