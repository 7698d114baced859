"""Roofline projection math (tools/perf_model.py).

Closed-form checks of the ring-collective wire formulas and the overlap
roofline, plus the config-calibration path on the tiny unit model.
"""

import os

import pytest

from declip_tpu.tools.perf_model import (CHIPS, Plan, _ring_allgather_s,
                                         _ring_allreduce_s, project,
                                         project_table)

V5E = CHIPS["v5e"]
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_ring_formulas():
    assert _ring_allreduce_s(1e9, 1, V5E) == 0.0
    assert _ring_allgather_s(1e9, 1, V5E) == 0.0
    # all-reduce moves 2*(n-1)/n of the buffer over 2*link_bw
    bw = V5E.ici_gbs_per_link * 1e9 * 2
    got = _ring_allreduce_s(1e9, 4, V5E)
    assert got == pytest.approx(2 * 1e9 * 3 / 4 / bw)
    # all-gather of an n-sharded buffer moves (n-1) shards
    got = _ring_allgather_s(2.5e8, 4, V5E)
    assert got == pytest.approx(2.5e8 * 3 / bw)
    # a 2-dim DP axis layout doubles usable links
    assert _ring_allreduce_s(1e9, 4, V5E, axes=2) == pytest.approx(got := (
        2 * 1e9 * 3 / 4 / (bw * 2)))


def test_dp_compute_bound_hides_comms():
    """DeCLIP-R50-sized DP run: grad all-reduce hides fully under 176ms."""
    row = project(114.0, 176.3, 128, V5E, Plan(chips=32))
    assert row["bound"] == "compute"
    assert row["t_step_ms"] == pytest.approx(176.3, abs=0.02)
    assert row["scaling_efficiency"] == pytest.approx(1.0, abs=1e-3)
    assert row["pairs_per_s"] == pytest.approx(32 * 128 / 0.1763, rel=1e-3)
    # comms leg itself is real (~10ms of wire time), just hidden
    assert 5.0 < row["t_comm_ms"] < 20.0


def test_ici_bound_exposes_comms_and_serial_upper_bound():
    """A 7B-param model with a 10ms step cannot hide its all-reduce."""
    row = project(7000.0, 10.0, 8, V5E, Plan(chips=16))
    assert row["bound"] == "ici"
    assert row["t_step_ms"] > 10.0
    assert row["t_step_serial_ms"] >= row["t_step_ms"]
    assert row["scaling_efficiency"] < 1.0
    # overlap=0 is the serial bound exactly
    serial = project(7000.0, 10.0, 8, V5E, Plan(chips=16), overlap=0.0)
    assert serial["t_step_ms"] == serial["t_step_serial_ms"]


def test_fsdp_costs_1p5x_dp_wire_time():
    dp = project(100.0, 1e-6, 128, V5E, Plan(4), overlap=0.0)
    fsdp = project(100.0, 1e-6, 128, V5E, Plan(4, fsdp=True), overlap=0.0)
    assert fsdp["t_comm_ms"] == pytest.approx(1.5 * dp["t_comm_ms"],
                                              rel=1e-2)


def test_efficiency_monotone_in_chips():
    rows = project_table(1000.0, 20.0, 64, V5E, [1, 2, 4, 8, 16, 32])
    effs = [r["scaling_efficiency"] for r in rows]
    assert effs[0] == 1.0
    assert all(a >= b - 1e-9 for a, b in zip(effs, effs[1:]))
    # once the ring exists (n>=2) its per-chip cost shrinks with n, so
    # throughput grows; the 1->2 transition may legitimately LOSE
    # throughput when heavily ICI-bound (the all-reduce appears at n=2)
    tps = [r["pairs_per_s"] for r in rows]
    assert all(b > a for a, b in zip(tps[1:], tps[2:]))


def test_config_calibration_path():
    from declip_tpu.tools.perf_model import _measured_from_config

    cfg = os.path.join(REPO, "experiments", "unit", "tiny_clip",
                       "config.yaml")
    params_m, flops = _measured_from_config(cfg, batch=4)
    assert params_m > 0.1
    if flops is not None:  # cost analysis is backend-dependent
        assert flops > 1e6


def test_cli_emits_json_rows(capsys):
    from declip_tpu.tools.perf_model import main

    main(["--params-m", "114", "--step-ms", "176.3", "--batch", "128",
          "--chip", "v5e", "--chips", "1,16"])
    lines = [l for l in capsys.readouterr().out.splitlines() if l.strip()]
    import json
    rows = [json.loads(l) for l in lines]
    assert len(rows) == 2 and rows[1]["chips"] == 16
    assert rows[1]["bound"] in ("compute", "ici")


def test_multislice_dcn_leg():
    """slices>1 adds the hierarchical all-reduce's cross-slice DCN phase:
    in-slice ICI wire unchanged, plus 2*(g/n)*(s-1)/s over per-chip DCN."""
    spec = CHIPS["v5e"]
    flat = project(81.4, 176.3, 128, spec, Plan(16))
    ms = project(81.4, 176.3, 128, spec, Plan(16, slices=4))
    assert ms["chips"] == 64 and ms["global_batch"] == 128 * 64
    assert ms["slices"] == 4 and ms["t_dcn_ms"] > 0
    assert ms["t_comm_ms"] == pytest.approx(
        flat["t_comm_ms"] + ms["t_dcn_ms"], abs=0.02)
    g = 81.4e6 * 4  # fp32 grad bytes
    expected_ms = 2.0 * (g / 16) * (3 / 4) / (3.1e9) * 1e3
    assert ms["t_dcn_ms"] == pytest.approx(expected_ms, abs=0.01)
    # a slow DCN fabric flips the binding constraint to 'dcn'
    slow = project(81.4, 20.0, 128, spec, Plan(16, slices=4, dcn_gbs=0.05))
    assert slow["bound"] == "dcn"
