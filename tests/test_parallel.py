"""Multi-chip sharding tests on the virtual 8-device CPU mesh
(SURVEY.md §4 implication (e) — something the reference never had).

Covers: ppermute halo exchange vs serial filter state, the time-sharded
1024-ch-bank pipeline (scaled down) vs its serial twin including cross-step
stream continuity, and the driver entry points.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import shard_map
from jax.sharding import PartitionSpec as P

from futuresdr_tpu.models.pfb_fm_bank import (
    BankConfig,
    make_bank_step,
    make_sharded_bank_step,
)
from futuresdr_tpu.ops import cplx
from futuresdr_tpu.ops.fir import conv1d_valid, fir_filter
from futuresdr_tpu.parallel import halo_left, make_mesh, ring_carry


def _rand_c64(n, seed=0):
    rng = np.random.default_rng(seed)
    return (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(
        np.complex64
    )


def test_halo_left_matches_serial_fir():
    """Time-sharded overlap-save FIR == serial streaming FIR."""
    taps = np.random.default_rng(1).standard_normal(33).astype(np.float32)
    T = len(taps)
    x = _rand_c64(8 * 512)
    xc = cplx.from_numpy(x)

    _, y_serial = fir_filter(xc, jnp.asarray(taps))  # zero initial state

    mesh = make_mesh(axis_names=("t",))

    def fn(xs):
        ext = halo_left(xs, T - 1, "t")
        return conv1d_valid(ext, jnp.asarray(taps))

    y_shard = shard_map(
        fn, mesh=mesh, in_specs=P("t"), out_specs=P("t"), check_vma=False
    )(xc)
    np.testing.assert_allclose(
        cplx.to_numpy(y_shard), cplx.to_numpy(y_serial), atol=1e-4
    )


def test_ring_carry_replicates_last_tail():
    mesh = make_mesh(axis_names=("t",))
    x = jnp.arange(8 * 16, dtype=jnp.float32)

    def fn(xs):
        return ring_carry(xs, 4, "t")

    out = shard_map(
        fn, mesh=mesh, in_specs=P("t"), out_specs=P("t"), check_vma=False
    )(x)
    # every shard's result is the global tail [124..127]
    got = np.asarray(out).reshape(8, 4)
    for row in got:
        np.testing.assert_array_equal(row, [124, 125, 126, 127])


def test_packed_stream_halo_roundtrip():
    """One ppermute carries several tails; the wrap edge is the carry."""
    mesh = make_mesh(axis_names=("t",))
    a = jnp.arange(8 * 6, dtype=jnp.float32).reshape(8, 6)
    b = -jnp.arange(8 * 4, dtype=jnp.float32).reshape(8, 4)
    carry0 = jnp.full((8, 10), 99.0, jnp.float32)

    from futuresdr_tpu.parallel import packed_stream_halo

    def fn(carry, aa, bb):
        (ra, rb), new_carry = packed_stream_halo(
            [aa.reshape(-1), bb.reshape(-1)], "t", carry.reshape(-1)
        )
        return new_carry.reshape(1, -1), ra.reshape(1, -1), rb.reshape(1, -1)

    out = shard_map(
        fn,
        mesh=mesh,
        in_specs=(P("t", None), P("t"), P("t")),
        out_specs=(P("t", None), P("t", None), P("t", None)),
        check_vma=False,
    )(carry0, a.reshape(-1), b.reshape(-1))
    new_carry, ra, rb = (np.asarray(o) for o in out)
    # shard 0 used the carry, shards i>0 the left neighbor's tails
    np.testing.assert_array_equal(ra[0], [99.0] * 6)
    np.testing.assert_array_equal(rb[0], [99.0] * 4)
    for i in range(1, 8):
        np.testing.assert_array_equal(ra[i], np.asarray(a)[i - 1])
        np.testing.assert_array_equal(rb[i], np.asarray(b)[i - 1])
    # every shard's new carry = its raw receive; shard 0's is the wrap
    np.testing.assert_array_equal(new_carry[0, :6], np.asarray(a)[7])
    np.testing.assert_array_equal(new_carry[0, 6:], np.asarray(b)[7])


def test_sharded_bank_matches_serial_two_steps():
    cfg = BankConfig(n_ch=8, taps_per_ch=4, audio_decim=4, audio_taps=16)
    N = 8 * 32 * 8  # 32 channelized rows per shard (>= Ha + L = 21)
    xc = cplx.from_numpy(_rand_c64(N))

    init, step = make_bank_step(cfg)
    st = init()
    st, a1 = jax.jit(step)(st, xc)
    st, a2 = jax.jit(step)(st, xc)

    mesh = make_mesh(axis_names=("time",))
    initc, sstep = make_sharded_bank_step(cfg, mesh)
    carry = initc()
    carry, b1 = jax.jit(sstep)(carry, xc)
    carry, b2 = jax.jit(sstep)(carry, xc)

    np.testing.assert_allclose(np.asarray(a1), np.asarray(b1), atol=1e-5)
    # step 2 proves the ring carry preserves stream continuity
    np.testing.assert_allclose(np.asarray(a2), np.asarray(b2), atol=1e-5)


def test_halo_larger_than_shard_rejected():
    mesh = make_mesh(axis_names=("t",))

    def fn(xs):
        return halo_left(xs, 100, "t")

    with pytest.raises(ValueError, match="halo"):
        shard_map(
            fn,
            mesh=mesh,
            in_specs=P("t"),
            out_specs=P("t"),
            check_vma=False,
        )(jnp.zeros(8 * 16))


def test_graft_entry_single_chip():
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    import __graft_entry__ as g

    fn, args = g.entry()
    state, audio = jax.jit(fn)(*args)
    jax.block_until_ready(audio)
    assert audio.shape[0] == 1024


def test_graft_dryrun_multichip():
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    import __graft_entry__ as g

    g.dryrun_multichip(8)


def test_sharded_bank_2d_matches_serial():
    """Channels × time 2D mesh (2×4 on the virtual devices) == serial."""
    from futuresdr_tpu.models.pfb_fm_bank import make_sharded_bank_step_2d

    cfg = BankConfig(n_ch=8, taps_per_ch=4, audio_decim=4, audio_taps=16)
    N = 8 * 8 * 16
    xc = cplx.from_numpy(_rand_c64(N, seed=7))

    init, step = make_bank_step(cfg)
    st = init()
    st, a1 = jax.jit(step)(st, xc)
    st, a2 = jax.jit(step)(st, xc)

    mesh = make_mesh((2, 4), ("ch", "time"))
    initc, sstep = make_sharded_bank_step_2d(cfg, mesh)
    carry = initc()
    carry, b1 = jax.jit(sstep)(carry, xc)
    carry, b2 = jax.jit(sstep)(carry, xc)

    np.testing.assert_allclose(np.asarray(a1), np.asarray(b1), atol=1e-5)
    np.testing.assert_allclose(np.asarray(a2), np.asarray(b2), atol=1e-5)


def test_sharded_bank_2d_partial_dft_matches_serial():
    """Partial-DFT 2D variant (branch-sharded channelizer + DFT row
    slice) == serial, including cross-chunk carries."""
    from futuresdr_tpu.models.pfb_fm_bank import (
        make_sharded_bank_step_2d_partial,
    )

    cfg = BankConfig(n_ch=8, taps_per_ch=4, audio_decim=4, audio_taps=16)
    N = 8 * 8 * 16
    xc = cplx.from_numpy(_rand_c64(N, seed=11))

    init, step = make_bank_step(cfg)
    st = init()
    st, a1 = jax.jit(step)(st, xc)
    st, a2 = jax.jit(step)(st, xc)

    mesh = make_mesh((2, 4), ("ch", "time"))
    initc, sstep = make_sharded_bank_step_2d_partial(cfg, mesh)
    carry = initc()
    carry, b1 = jax.jit(sstep)(carry, xc)
    carry, b2 = jax.jit(sstep)(carry, xc)

    np.testing.assert_allclose(np.asarray(a1), np.asarray(b1), atol=1e-5)
    np.testing.assert_allclose(np.asarray(a2), np.asarray(b2), atol=1e-5)


def test_sharded_fused_bank_matches_serial_fused():
    """The fused Pallas kernel inside shard_map (interpret mode on the
    CPU mesh) == the serial fused step, two steps (carry continuity)."""
    from futuresdr_tpu.models.pfb_fm_bank import (
        make_bank_step_fused,
        make_sharded_bank_step_fused,
    )

    cfg = BankConfig(n_ch=8, taps_per_ch=4, audio_decim=4, audio_taps=16)
    N = 8 * 32 * 8
    xc = cplx.from_numpy(_rand_c64(N, seed=3))

    init, step = make_bank_step_fused(cfg, interpret=True)
    st = init()
    st, a1 = jax.jit(step)(st, xc)
    st, a2 = jax.jit(step)(st, xc)

    mesh = make_mesh(axis_names=("time",))
    initc, sstep = make_sharded_bank_step_fused(cfg, mesh)
    carry = initc()
    carry, b1 = jax.jit(sstep)(carry, xc)
    carry, b2 = jax.jit(sstep)(carry, xc)

    np.testing.assert_allclose(np.asarray(a1), np.asarray(b1), atol=1e-5)
    np.testing.assert_allclose(np.asarray(a2), np.asarray(b2), atol=1e-5)


def test_sharded_fused_bank_2d_matches_serial_fused():
    from futuresdr_tpu.models.pfb_fm_bank import (
        make_bank_step_fused,
        make_sharded_bank_step_2d_fused,
    )

    cfg = BankConfig(n_ch=8, taps_per_ch=4, audio_decim=4, audio_taps=16)
    N = 4 * 32 * 8
    xc = cplx.from_numpy(_rand_c64(N, seed=5))

    init, step = make_bank_step_fused(cfg, interpret=True)
    st = init()
    st, a1 = jax.jit(step)(st, xc)
    st, a2 = jax.jit(step)(st, xc)

    mesh = make_mesh((2, 4), ("ch", "time"))
    initc, sstep = make_sharded_bank_step_2d_fused(cfg, mesh)
    carry = initc()
    carry, b1 = jax.jit(sstep)(carry, xc)
    carry, b2 = jax.jit(sstep)(carry, xc)

    np.testing.assert_allclose(np.asarray(a1), np.asarray(b1), atol=1e-5)
    np.testing.assert_allclose(np.asarray(a2), np.asarray(b2), atol=1e-5)


def test_sharded_bank_rejects_small_shards():
    """Shards smaller than the boundary-recompute window must raise."""
    cfg = BankConfig(n_ch=8, taps_per_ch=4, audio_decim=4, audio_taps=16)
    mesh = make_mesh(axis_names=("time",))
    initc, sstep = make_sharded_bank_step(cfg, mesh)
    xc = cplx.from_numpy(_rand_c64(8 * 16 * 8))  # 16 rows < Ha+L=21
    with pytest.raises(ValueError, match="boundary-tail"):
        jax.jit(sstep)(initc(), xc)


def test_sharded_fused_bank_2d_partial_matches_serial_fused():
    """Partial-DFT layout on the fused kernel family (branch-sharded FIR
    + all_gather + in-VMEM DFT slice/demod) == serial fused, 2 steps."""
    from futuresdr_tpu.models.pfb_fm_bank import (
        make_bank_step_fused,
        make_sharded_bank_step_2d_partial_fused,
    )

    cfg = BankConfig(n_ch=8, taps_per_ch=4, audio_decim=4, audio_taps=16)
    N = 4 * 32 * 8
    xc = cplx.from_numpy(_rand_c64(N, seed=9))

    init, step = make_bank_step_fused(cfg, interpret=True)
    st = init()
    st, a1 = jax.jit(step)(st, xc)
    st, a2 = jax.jit(step)(st, xc)

    mesh = make_mesh((2, 4), ("ch", "time"))
    initc, sstep = make_sharded_bank_step_2d_partial_fused(cfg, mesh)
    carry = initc()
    carry, b1 = jax.jit(sstep)(carry, xc)
    carry, b2 = jax.jit(sstep)(carry, xc)

    np.testing.assert_allclose(np.asarray(a1), np.asarray(b1), atol=1e-5)
    np.testing.assert_allclose(np.asarray(a2), np.asarray(b2), atol=1e-5)


def test_sharded_bank_2d_partial_shardcount_invariant_under_bf16():
    """The 2d-partial variant's steady-state channelizer FIR is always
    f32 (conv1d_valid_branches_w); its boundary recompute must use the
    SAME numerics, or the halo-carried state diverges from what the
    receiving shard would compute itself and the output depends on
    where the time-shard seams fall. Regression: under
    fir_dtype=bfloat16 the boundary used the config-sensitive conv
    (bf16) while steady state stayed f32 — outputs shifted ~6e-3
    between shard counts. The audio stage legitimately reads the
    config, but identically per output sample, so with consistent
    boundaries the output is bit-identical across mesh shapes."""
    from futuresdr_tpu import config
    from futuresdr_tpu.models.pfb_fm_bank import (
        make_sharded_bank_step_2d_partial,
    )

    cfg = BankConfig(n_ch=8, taps_per_ch=4, audio_decim=4, audio_taps=16)
    N = 8 * 8 * 16
    xc = cplx.from_numpy(_rand_c64(N, seed=13))

    def run_two_steps(n_time):
        mesh = make_mesh((2, n_time), ("ch", "time"))
        initc, sstep = make_sharded_bank_step_2d_partial(cfg, mesh)
        carry = initc()
        carry, b1 = jax.jit(sstep)(carry, xc)
        carry, b2 = jax.jit(sstep)(carry, xc)
        return np.asarray(b1), np.asarray(b2)

    config.set("fir_dtype", "bfloat16")
    try:
        t2_1, t2_2 = run_two_steps(2)
        t4_1, t4_2 = run_two_steps(4)
    finally:
        config.set("fir_dtype", "float32")
    np.testing.assert_allclose(t2_1, t4_1, atol=1e-6)
    np.testing.assert_allclose(t2_2, t4_2, atol=1e-6)
