"""Hardware-campaign driver: export -> execute -> ingest -> CSV, resumable.

The reference's hardware loop (submit per-(inst, t), block, append realtime
CSV, decode raw records post-hoc) as ONE resumable command
(autocorr-delta-a-single-qiskit-fast-ibm.py:222-224,295-316).
"""

import json
import os

import numpy as np

from dtc_tpu.experiments.campaign import run_hardware_campaign
from dtc_tpu.io import csvio
from dtc_tpu.io.disorder import generate_disorder
from dtc_tpu.utils.config import SimConfig

CFG = SimConfig(L=4, g=0.84, inst=2, tf=5, noise_prob=0.05, use_noise=1,
                n_trajectories=128, seed=3)


def test_campaign_closed_loop(tmp_path):
    hs, phis = generate_disorder(CFG.L, CFG.inst, seed=5)
    r = run_hardware_campaign(
        CFG, hs, phis, job_dir=str(tmp_path / "jobs"),
        out_dir=str(tmp_path / "out"), shots=4096, simulate=True)
    # export wrote one QASM per (instance, t) per kind + manifest
    for kind in ("forward", "echo"):
        kdir = tmp_path / "jobs" / kind
        manifest = json.load(open(kdir / "manifest.json"))
        assert len(manifest["jobs"]) == CFG.inst * CFG.tf
        assert all((kdir / j["qasm"]).exists() for j in manifest["jobs"])
    assert r["completed"]["forward"] == CFG.inst * CFG.tf
    assert r["rows_on_disk"] == CFG.tf
    cols = csvio.read_columns(r["csv_path"])
    assert list(cols) == ["time", "av_autocorr", "av_autocorr_echo",
                          "sqrt_av_autocorr_echo"]
    # sampled A(0) must sit near (1-p)^6 (shot noise ~ 1/sqrt(4096*inst))
    af = (1 - CFG.noise_prob) ** 6
    assert abs(cols["av_autocorr"][0] - af) < 5 / np.sqrt(4096 * CFG.inst)
    assert abs(cols["av_autocorr_echo"][0] - af) < 5 / np.sqrt(4096 * CFG.inst)


def test_campaign_partial_batch_recovery(tmp_path):
    """Incomplete jobs hold back their time rows; a later run with the
    missing results appends ONLY the remaining rows (realtime semantics)."""
    hs, phis = generate_disorder(CFG.L, CFG.inst, seed=5)
    job_dir, out_dir = str(tmp_path / "jobs"), str(tmp_path / "out")
    r1 = run_hardware_campaign(
        CFG, hs, phis, job_dir=job_dir, out_dir=out_dir, shots=512,
        simulate=True, simulate_fail_fraction=0.3)
    assert r1["completed"]["forward"] < CFG.inst * CFG.tf
    assert r1["rows_on_disk"] < CFG.tf
    # job 0 (inst 0, t=0) is marked queued by the failure pattern -> no rows
    assert r1["rows_on_disk"] == 0
    # hardware finishes the failed jobs: re-simulate with no failures
    r2 = run_hardware_campaign(
        CFG, hs, phis, job_dir=job_dir, out_dir=out_dir, shots=512,
        simulate=True)
    assert r2["export"] == {"forward": "existing", "echo": "existing"}
    assert r2["completed"]["forward"] == CFG.inst * CFG.tf
    assert r2["rows_on_disk"] == CFG.tf
    cols = csvio.read_columns(r2["csv_path"])
    assert len(cols["time"]) == CFG.tf


def test_campaign_ingest_reference_style_records(tmp_path):
    """Records WITHOUT instance/t metadata (bare reference-style dumps) are
    grouped positionally after timestamp sort (autocorr-iqm-data-fix.py)."""
    cfg = CFG.replace(inst=1, tf=3)
    hs, phis = generate_disorder(cfg.L, cfg.inst, seed=5)
    job_dir = str(tmp_path / "jobs")
    results = tmp_path / "res" / "forward"
    results.mkdir(parents=True)
    for t, a in enumerate((1.0, -1.0, 1.0)):
        n0 = 8 if a > 0 else 0
        rec = {"created": f"2024-01-01T00:00:{t:02d}",
               "status": "completed",
               "measurements": {"c_1_0_0": [[0]] * n0 + [[1]] * (8 - n0)}}
        with open(results / f"job{t}.json", "w") as f:
            json.dump(rec, f)
    r = run_hardware_campaign(
        cfg, hs, phis, job_dir=job_dir, results_dir=str(tmp_path / "res"),
        out_dir=str(tmp_path / "out"), shots=8)
    np.testing.assert_allclose(r["forward"][0], [1.0, -1.0, 1.0])
    assert r["rows_on_disk"] == 3  # echo columns NaN-tolerant


def test_campaign_incomplete_bare_batch_is_skipped(tmp_path):
    """Bare records that do NOT form a complete batch are skipped with a
    warning: positional slot inference would silently shift every record
    after a gap into the wrong (instance, t) slot."""
    import warnings

    cfg = CFG.replace(inst=1, tf=3)
    hs, phis = generate_disorder(cfg.L, cfg.inst, seed=5)
    results = tmp_path / "res" / "forward"
    results.mkdir(parents=True)
    # only 2 of the 3 jobs landed (t=1 still queued upstream)
    for t in (0, 2):
        rec = {"created": f"2024-01-01T00:00:{t:02d}",
               "status": "completed",
               "measurements": {"c_1_0_0": [[0]] * 8}}
        with open(results / f"job{t}.json", "w") as f:
            json.dump(rec, f)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        r = run_hardware_campaign(
            cfg, hs, phis, job_dir=str(tmp_path / "jobs"),
            results_dir=str(tmp_path / "res"),
            out_dir=str(tmp_path / "out"), shots=8)
    assert any("positional" in str(x.message) for x in w)
    # nothing decoded (NOT the t=2 record misfiled into the t=1 slot)
    assert np.isnan(r["forward"]).all()
    assert r["rows_on_disk"] == 0


def test_campaign_echo_backfill_after_forward_rows(tmp_path):
    """Echo results landing AFTER forward rows were appended must be
    back-filled into the CSV (the reference flow runs forward and echo as
    separate campaigns; the realtime writer alone would leave the echo
    columns NaN forever)."""
    cfg = CFG.replace(inst=1, tf=2)
    hs, phis = generate_disorder(cfg.L, cfg.inst, seed=6)

    def drop(kind, t, bits_val):
        kdir = tmp_path / "res" / kind
        kdir.mkdir(parents=True, exist_ok=True)
        rec = {"created": f"2024-01-01T00:00:{t:02d}", "status": "completed",
               "instance": 0, "t": t,
               "measurements": {"c_1_0_0": [[bits_val]] * 8}}
        with open(kdir / f"job{t}.json", "w") as f:
            json.dump(rec, f)

    kw = dict(job_dir=str(tmp_path / "jobs"),
              results_dir=str(tmp_path / "res"),
              out_dir=str(tmp_path / "out"), shots=8)
    for t in range(2):
        drop("forward", t, 0)
    r1 = run_hardware_campaign(cfg, hs, phis, **kw)
    assert r1["rows_on_disk"] == 2
    from dtc_tpu.io.csvio import read_columns

    c1 = read_columns(r1["csv_path"])
    assert np.isnan(c1["av_autocorr_echo"]).all()
    # echo batch lands later; re-running the campaign back-fills the rows
    for t in range(2):
        drop("echo", t, 0)
    r2 = run_hardware_campaign(cfg, hs, phis, **kw)
    assert r2["rows_on_disk"] == 2
    c2 = read_columns(r2["csv_path"])
    np.testing.assert_allclose(c2["av_autocorr_echo"], [1.0, 1.0])
    np.testing.assert_allclose(c2["av_autocorr"], c1["av_autocorr"])


def test_campaign_persisted_rows_survive_record_regression(tmp_path):
    """Rows already checkpointed to the CSV must survive a rerun even if an
    EARLIER forward record has since vanished/failed to decode — realtime
    semantics trust what was persisted and only gate NEW rows on decoding
    (regression: a from-zero rebuild used to truncate the file to nothing)."""
    cfg = CFG.replace(inst=1, tf=3)
    hs, phis = generate_disorder(cfg.L, cfg.inst, seed=7)

    def drop(kind, t):
        kdir = tmp_path / "res" / kind
        kdir.mkdir(parents=True, exist_ok=True)
        rec = {"created": f"2024-01-01T00:00:{t:02d}", "status": "completed",
               "instance": 0, "t": t,
               "measurements": {"c_1_0_0": [[0]] * 8}}
        with open(kdir / f"job{t}.json", "w") as f:
            json.dump(rec, f)

    kw = dict(job_dir=str(tmp_path / "jobs"),
              results_dir=str(tmp_path / "res"),
              out_dir=str(tmp_path / "out"), shots=8)
    for t in range(2):
        drop("forward", t)
    r1 = run_hardware_campaign(cfg, hs, phis, **kw)
    assert r1["rows_on_disk"] == 2
    # the t=0 record regresses; a NEW completed t=2 lands
    os.remove(tmp_path / "res" / "forward" / "job0.json")
    drop("forward", 2)
    r2 = run_hardware_campaign(cfg, hs, phis, **kw)
    assert r2["rows_written"] == 1
    assert r2["rows_on_disk"] == 3
    cols = csvio.read_columns(r2["csv_path"])
    assert len(cols["time"]) == 3
    np.testing.assert_allclose(cols["time"], [0, 1, 2])
    # the persisted t=0/t=1 forward values are untouched
    np.testing.assert_allclose(cols["av_autocorr"][:2],
                               csvio.read_columns(r1["csv_path"])["av_autocorr"][:2])


def test_realtime_writer_resume_and_overwrite(tmp_path):
    """resume_index counts rows written by the writer itself (regression:
    the header compare kept the trailing newline and always returned 0,
    silently truncate-rewriting on every reopen); resume=False truncates."""
    from dtc_tpu.io.csvio import RealtimeCSVWriter

    path = str(tmp_path / "rt.csv")
    fields = ["time", "value"]
    with RealtimeCSVWriter(path, fields) as w:
        assert w.resume_index() == 0
        w.write_row({"time": 0, "value": 1.5})
        w.write_row({"time": 1, "value": 2.5})
    w2 = RealtimeCSVWriter(path, fields)
    assert w2.resume_index() == 2
    with w2:
        w2.write_row({"time": 2, "value": 3.5})
    assert csvio.read_columns(path)["time"].tolist() == [0.0, 1.0, 2.0]
    # resume=False: a recompute-from-zero loop overwrites instead
    with RealtimeCSVWriter(path, fields, resume=False) as w3:
        w3.write_row({"time": 0, "value": 9.0})
    cols = csvio.read_columns(path)
    assert cols["time"].tolist() == [0.0] and cols["value"].tolist() == [9.0]
