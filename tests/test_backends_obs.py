"""Backends, QASM round-trip validation, counts sampling."""

import json
import os

import numpy as np
import pytest

from dtc_tpu.device.backends import QasmExportBackend, SimulatorBackend
from dtc_tpu.device.qasm import circuit_to_qasm, parse_qasm_gates
from dtc_tpu.io.disorder import generate_disorder
from dtc_tpu.models.drives import build_kick_schedule
from dtc_tpu.observables import counts_to_z_expectation, sample_counts
from dtc_tpu.utils.config import SimConfig

import exact_oracle as oracle


def test_qasm_roundtrip_simulates_to_same_value(tmp_path):
    """Parse the exported QASM and re-simulate it gate-by-gate with the
    independent oracle ops — must equal the direct oracle value."""
    L, t, g = 3, 3, 0.9
    hs, phis = generate_disorder(L, 1, seed=80)
    sched = build_kick_schedule("x", g, t)
    text = circuit_to_qasm(L, hs[0], phis[0], t, sched)
    gates = parse_qasm_gates(text)

    n = L + 1  # ancilla = qubit 0 in the QASM convention
    psi = np.zeros(2**n, dtype=complex)
    psi[0] = 1.0
    for name, params, qubits in gates:
        if name == "measure":
            continue
        if name == "h":
            u = oracle.op_on(oracle.H, qubits[0], n)
        elif name == "x":
            u = oracle.op_on(oracle.X, qubits[0], n)
        elif name == "cz":
            cz = np.diag([1, 1, 1, -1]).astype(complex)
            # embed CZ via projectors (symmetric)
            p0 = np.array([[1, 0], [0, 0]], dtype=complex)
            p1 = np.array([[0, 0], [0, 1]], dtype=complex)
            u = (oracle.op_on(p0, qubits[0], n)
                 + oracle.op_on(p1, qubits[0], n)
                 @ oracle.op_on(np.diag([1, -1]).astype(complex), qubits[1], n))
        elif name == "rx":
            u = oracle.op_on(oracle.rx(params[0]), qubits[0], n)
        elif name == "ry":
            u = oracle.op_on(oracle.ry(params[0]), qubits[0], n)
        elif name == "rz":
            u = oracle.op_on(oracle.rz(params[0]), qubits[0], n)
        elif name == "rzz":
            u = oracle.op_on(oracle.rzz_matrix(params[0]), min(qubits), n)
        else:
            raise AssertionError(name)
        psi = u @ psi
    # <Z_ancilla> with ancilla = QASM qubit 0
    za = oracle.op_on(oracle.Z, 0, n)
    got = float(np.real(psi.conj() @ (za @ psi)))
    want = oracle.autocorr_dm(L, g, hs[0], phis[0], t, 0.0)
    np.testing.assert_allclose(got, want, atol=1e-10)


def test_qasm_export_backend_and_decode_pipeline(tmp_path):
    """Full hardware-runner loop: submit QASM jobs, fabricate raw results,
    ingest through the merge/decode pipeline."""
    cfg = SimConfig(L=4, tf=3, inst=2, use_noise=0)
    hs, phis = generate_disorder(cfg.L, cfg.inst, seed=81)
    be = QasmExportBackend(cfg, str(tmp_path / "jobs"), shots=400)
    paths = be.submit_sweep(hs, phis)
    assert len(paths) == cfg.inst * cfg.tf
    manifest = json.load(open(tmp_path / "jobs" / "manifest.json"))
    assert manifest["jobs_per_instance"] == cfg.tf
    assert manifest["jobs"][0]["gate_counts"]["u2"] == 6

    # fabricate raw results in submission order with known expectations
    rng = np.random.default_rng(0)
    results = []
    truth = []
    for j, job in enumerate(manifest["jobs"]):
        p1 = 0.1 + 0.05 * j
        bits = [[1 if rng.random() < p1 else 0] for _ in range(400)]
        truth.append(1 - 2 * np.mean([b[0] for b in bits]))
        results.append({"id": f"r{j}", "created": f"2025-02-{j+1:02d}",
                        "status": "completed",
                        "measurements": {"c_1_0_0": bits}})
    os.makedirs(tmp_path / "results")
    with open(tmp_path / "results" / "all.json", "w") as f:
        json.dump(results, f)
    series = be.ingest_results(str(tmp_path / "results"))
    assert series.shape == (cfg.inst, cfg.tf)
    np.testing.assert_allclose(series.ravel(), truth, atol=1e-12)


def test_simulator_backend():
    cfg = SimConfig(L=4, tf=4, use_noise=0, inst=1, dtype="complex128")
    hs, phis = generate_disorder(cfg.L, 1, seed=82)
    r = SimulatorBackend(cfg).run_autocorr(hs, phis)
    want = oracle.autocorr_dm(cfg.L, cfg.g, hs[0], phis[0], 2, 0.0)
    np.testing.assert_allclose(r["av_autocorr"][2], want, atol=1e-10)


def test_sample_counts_statistics():
    probs = np.array([0.5, 0.25, 0.125, 0.125])
    counts = sample_counts(probs, 40000, n_qubits=2, seed=1)
    assert set(counts) <= {"00", "01", "10", "11"}
    assert abs(counts["00"] / 40000 - 0.5) < 0.02
    # little-endian reduction: <Z_0> = p(bit0=0) - p(bit0=1)
    z = counts_to_z_expectation(counts, 2)
    want_z0 = (probs[0] + probs[2]) - (probs[1] + probs[3])
    assert abs(z[0] - want_z0) < 0.03
