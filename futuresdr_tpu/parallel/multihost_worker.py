"""Multi-host proof worker: run with N processes, compare vs serial.

    python -m futuresdr_tpu.parallel.multihost_worker \
        --coordinator localhost:PORT --num-processes N --process-id I \
        --local-devices M

Every process builds the same deterministic wideband input, runs two steps
of the host×chip-sharded bank (time on DCN, channels on ICI), gathers the
audio, and process 0 asserts numeric equality with the serial pipeline,
printing ``MULTIHOST_OK <maxerr>`` on success. This is the N≥2-hosts
measurement rig demanded by BASELINE.json ("measured at 1 chip, 1 host,
and N≥2 hosts") runnable on CPU-only machines.
"""

from __future__ import annotations

import argparse
import sys


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--coordinator", required=True)
    ap.add_argument("--num-processes", type=int, required=True)
    ap.add_argument("--process-id", type=int, required=True)
    ap.add_argument("--local-devices", type=int, default=4)
    ap.add_argument("--r-per-shard", type=int, default=32)
    args = ap.parse_args()

    from futuresdr_tpu.parallel.multihost import (
        gather_to_host,
        global_iq_array,
        init_multihost,
        make_host_chip_mesh,
        make_multihost_bank_step,
    )

    init_multihost(
        args.coordinator,
        args.num_processes,
        args.process_id,
        local_device_count=args.local_devices,
    )

    import jax
    import numpy as np

    from futuresdr_tpu.models.pfb_fm_bank import BankConfig, make_bank_step

    assert jax.process_count() == args.num_processes
    mesh = make_host_chip_mesh()

    cfg = BankConfig(n_ch=16, taps_per_ch=4, audio_decim=4, audio_taps=16)
    n_time_shards = mesh.shape["dcn"]
    n = n_time_shards * args.r_per_shard * cfg.n_ch
    rng = np.random.default_rng(0)  # same seed on every host
    x_np = (
        rng.standard_normal(n) + 1j * rng.standard_normal(n)
    ).astype(np.complex64)

    init_carry, step = make_multihost_bank_step(cfg, mesh)
    x = global_iq_array(mesh, x_np)
    carry = init_carry()
    step_j = jax.jit(step)
    carry, a1 = step_j(carry, x)
    carry, a2 = step_j(carry, x)
    a1_full = gather_to_host(a1)
    a2_full = gather_to_host(a2)

    # serial reference on local devices only
    from futuresdr_tpu.ops import cplx

    init_s, sstep = make_bank_step(cfg)
    st = init_s()
    xc = cplx.from_numpy(x_np)
    st, s1 = jax.jit(sstep)(st, xc)
    st, s2 = jax.jit(sstep)(st, xc)
    e1 = float(np.max(np.abs(np.asarray(s1) - a1_full)))
    e2 = float(np.max(np.abs(np.asarray(s2) - a2_full)))
    ok = e1 < 1e-5 and e2 < 1e-5

    # --- partial-DFT 2D variant (branch-sharded channelizer, operands
    # committed onto the multi-process mesh) over the same host×chip mesh
    from futuresdr_tpu.models.pfb_fm_bank import (
        make_sharded_bank_step_2d_partial,
    )
    from futuresdr_tpu.parallel.multihost import gather_to_host as _gth

    init_p, pstep = make_sharded_bank_step_2d_partial(
        cfg, mesh, ch_axis="ici", time_axis="dcn"
    )
    cp = init_p()
    pstep_j = jax.jit(pstep)
    cp, p1 = pstep_j(cp, x)
    cp, p2 = pstep_j(cp, x)
    ep = max(
        float(np.max(np.abs(np.asarray(s1) - _gth(p1)))),
        float(np.max(np.abs(np.asarray(s2) - _gth(p2)))),
    )
    partial_ok = ep < 1e-5

    # --- fused-Pallas sharded bank (interpret mode on CPU) over a FLAT
    # time mesh spanning every device of every process
    from jax.sharding import Mesh

    from futuresdr_tpu.models.pfb_fm_bank import (
        make_bank_step_fused,
        make_sharded_bank_step_fused,
    )
    from futuresdr_tpu.parallel.multihost import global_iq_array

    fmesh = Mesh(
        np.asarray(
            sorted(jax.devices(), key=lambda d: (d.process_index, d.id))
        ),
        ("dcn",),  # flat time axis; name reused so global_iq_array shards it
    )
    n_f = len(jax.devices()) * args.r_per_shard * cfg.n_ch
    xf_np = (
        rng.standard_normal(n_f) + 1j * rng.standard_normal(n_f)
    ).astype(np.complex64)
    xf = global_iq_array(fmesh, xf_np)
    init_cf, fstep = make_sharded_bank_step_fused(
        cfg, fmesh, axis="dcn", interpret=True
    )
    cfc = init_cf()
    fstep_j = jax.jit(fstep)
    cfc, f1 = fstep_j(cfc, xf)
    cfc, f2 = fstep_j(cfc, xf)
    init_sf, sfstep = make_bank_step_fused(cfg, interpret=True)
    stf = init_sf()
    xfc = cplx.from_numpy(xf_np)
    stf, sf1 = jax.jit(sfstep)(stf, xfc)
    stf, sf2 = jax.jit(sfstep)(stf, xfc)
    ef = max(
        float(np.max(np.abs(np.asarray(sf1) - _gth(f1)))),
        float(np.max(np.abs(np.asarray(sf2) - _gth(f2)))),
    )
    fused_ok = ef < 1e-5

    # --- partial-DFT FUSED variant over the 2D host×chip mesh: the one
    # layout whose shard closures must never capture a sharded operand
    # (its boundary recompute uses a replicated full-taps CONSTANT) —
    # only a real multi-process mesh exercises that distinction
    from futuresdr_tpu.models.pfb_fm_bank import (
        make_sharded_bank_step_2d_partial_fused,
    )

    init_pf, pfstep = make_sharded_bank_step_2d_partial_fused(
        cfg, mesh, ch_axis="ici", time_axis="dcn", interpret=True
    )
    cpf = init_pf()
    pfstep_j = jax.jit(pfstep)
    cpf, pf1 = pfstep_j(cpf, x)
    cpf, pf2 = pfstep_j(cpf, x)
    stf2 = init_sf()
    stf2, sg1 = jax.jit(sfstep)(stf2, xc)
    stf2, sg2 = jax.jit(sfstep)(stf2, xc)
    epf = max(
        float(np.max(np.abs(np.asarray(sg1) - _gth(pf1)))),
        float(np.max(np.abs(np.asarray(sg2) - _gth(pf2)))),
    )
    pfused_ok = epf < 1e-5

    # --- mesh-compiled COMPOSED FLOWGRAPH across real processes (r5):
    # the user-facing tier — compile_flowgraph(mesh=...) on the flat
    # multi-process time mesh, stepped manually per process, must equal
    # the single-process compiled graph. Exercises put_params'
    # NamedSharding placement and the suffix/ppermute machinery over a
    # real DCN boundary.
    from jax.sharding import NamedSharding
    from jax.sharding import PartitionSpec as P

    from futuresdr_tpu.blocks import (
        Fir,
        PfbChannelizer,
        QuadratureDemod,
        ResidentSource,
        VectorSink,
    )
    from futuresdr_tpu.dsp import firdes, windows
    from futuresdr_tpu.runtime.compiler import compile_flowgraph
    from futuresdr_tpu.runtime.flowgraph import Flowgraph

    M_fg, D_fg = 16, 4
    n_fg = len(jax.devices()) * 64 * M_fg * D_fg
    xw = (
        rng.standard_normal(n_fg) + 1j * rng.standard_normal(n_fg)
    ).astype(np.complex64) * 0.1
    ataps = firdes.lowpass(0.4 / D_fg, windows.hamming(32))

    def _bank_fg():
        fgr = Flowgraph()
        src = ResidentSource(xw.copy())
        ch = PfbChannelizer(M_fg)
        fgr.stream(src, ch)
        sinks = []
        for kk in range(M_fg):
            dmd = QuadratureDemod(1.0)
            fir = Fir.decimating(ataps, D_fg, dtype=np.float32)
            snk = VectorSink(np.float32)
            fgr.stream(ch, dmd, src_port=kk)
            fgr.stream(dmd, fir)
            fgr.stream(fir, snk)
            sinks.append(snk)
        return fgr

    fg_m = _bank_fg()
    cfg_m = compile_flowgraph(
        fg_m, chunk_size=n_fg, mesh=fmesh, mesh_axis="dcn"
    )
    sh = NamedSharding(fmesh, P("dcn"))
    states_m = jax.tree_util.tree_map(
        lambda a: jax.device_put(np.asarray(a), sh), cfg_m.init_states()
    )
    params_m = cfg_m.put_params(cfg_m.gather_params())
    states_m, sinks1, _ = cfg_m.step(states_m, params_m, {})
    states_m, sinks2, _ = cfg_m.step(states_m, params_m, {})

    fg_s = _bank_fg()
    cfg_s = compile_flowgraph(fg_s, chunk_size=n_fg)
    st_s = cfg_s.init_states()
    pr_s = jax.device_put(cfg_s.gather_params())
    st_s, ser1, _ = cfg_s.step(st_s, pr_s, {})
    st_s, ser2, _ = cfg_s.step(st_s, pr_s, {})
    efg = 0.0
    for key in ser1:
        efg = max(
            efg,
            float(np.max(np.abs(np.asarray(ser1[key]) - _gth(sinks1[key])))),
            float(np.max(np.abs(np.asarray(ser2[key]) - _gth(sinks2[key])))),
        )
    fg_mesh_ok = efg < 1e-5

    # --- sharded WLAN sync front across hosts (flat time axis over every
    # device of every process; ppermute halos ride the DCN boundary) ----
    from futuresdr_tpu.models.wlan.sharded import (
        check_sharded_rx_vs_serial,
        check_sharded_vs_serial,
    )

    wmesh = Mesh(np.asarray(jax.devices()), ("t",))
    try:
        check_sharded_vs_serial(wmesh, gap=2500, seed=7, use_global=True)
        wlan_ok = True
    except AssertionError:
        wlan_ok = False
    # ... and the FULL sharded receiver (frame-parallel equalize+Viterbi)
    # byte-for-byte vs the serial WlanReceiver, across real processes
    try:
        check_sharded_rx_vs_serial(wmesh)
        wlan_rx_ok = True
    except AssertionError:
        wlan_rx_ok = False
    ok = (
        ok and wlan_ok and wlan_rx_ok and partial_ok and fused_ok
        and pfused_ok and fg_mesh_ok
    )

    if args.process_id == 0:
        print(
            f"MULTIHOST_{'OK' if ok else 'FAIL'} maxerr={max(e1, e2):.3e} "
            f"partial={'ok' if partial_ok else 'FAIL'}({ep:.1e}) "
            f"fused={'ok' if fused_ok else 'FAIL'}({ef:.1e}) "
            f"pfused={'ok' if pfused_ok else 'FAIL'}({epf:.1e}) "
            f"fg_mesh={'ok' if fg_mesh_ok else 'FAIL'}({efg:.1e}) "
            f"wlan_front={'ok' if wlan_ok else 'FAIL'} "
            f"wlan_rx={'ok' if wlan_rx_ok else 'FAIL'} "
            f"procs={jax.process_count()} devices={len(jax.devices())}",
            flush=True,
        )
    jax.distributed.shutdown()
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
