"""Driver entry points must be outage-proof (round-2 regression).

Round 2's driver artifacts scored zero because both entry points touched the
axon TPU backend during a tunnel outage: ``dryrun_multichip`` probed
``jax.devices()`` first (backend init BLOCKED -> rc=124 timeout) and
``bench.py`` called ``jax.default_backend()`` unguarded (init raised ->
rc=1). These tests pin the fixes:

- step construction with no backend initialized is backend-silent;
- ``dryrun_multichip`` never initializes any non-CPU backend, even without
  the pytest conftest's CPU forcing;
- ``bench.py`` emits one parseable JSON line with an ``unavailable`` marker
  (never a traceback) when the accelerator stays unreachable.
"""

import importlib.util
import json
import os
import subprocess
import sys
import textwrap

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _clean_env():
    """Env without the conftest's CPU forcing — what the driver process sees."""
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env.pop("VQVAE_TPU_XLA_OPTS", None)
    flags = env.get("XLA_FLAGS", "")
    env["XLA_FLAGS"] = " ".join(
        f for f in flags.split() if "host_platform_device_count" not in f)
    return env


def test_compiler_options_backend_silent():
    """_xla_compiler_options with no backend initialized returns None WITHOUT
    triggering backend init (a hanging init is not an exception)."""
    code = textwrap.dedent("""
        from vqvae_tpu.train.steps import _xla_compiler_options, \\
            _initialized_backend
        assert _initialized_backend() is None
        assert _xla_compiler_options() is None
        from jax._src import xla_bridge as xb
        assert not xb._backends, list(xb._backends)  # still uninitialized
        print("SILENT_OK")
    """)
    r = subprocess.run([sys.executable, "-c", code], cwd=REPO,
                       env=_clean_env(), capture_output=True, text=True,
                       timeout=120)
    assert r.returncode == 0, r.stderr
    assert "SILENT_OK" in r.stdout


def test_compiler_options_tpu_default(monkeypatch):
    """With an initialized TPU backend the scoped-vmem default applies."""
    import jax

    from vqvae_tpu.train import steps

    monkeypatch.delenv("VQVAE_TPU_XLA_OPTS", raising=False)
    jax.devices()  # ensure the (cpu) backend registry is non-empty
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    assert steps._xla_compiler_options() == {
        "xla_tpu_scoped_vmem_limit_kib": "57344"}


def test_dryrun_multichip_never_dials_tpu():
    """dryrun_multichip runs hermetically on the virtual CPU platform: after
    a full dryrun, the ONLY initialized backend is 'cpu' — even when the
    process env does not force CPU (the driver invokes it without conftest).
    """
    code = textwrap.dedent("""
        import sys
        sys.path.insert(0, %r)
        import __graft_entry__ as ge
        ge.dryrun_multichip(2)
        from jax._src import xla_bridge as xb
        assert set(xb._backends) == {"cpu"}, list(xb._backends)
        print("HERMETIC_OK")
    """ % REPO)
    # timeout is the regression signal: the round-2 failure mode was a hang
    r = subprocess.run([sys.executable, "-c", code], cwd=REPO,
                       env=_clean_env(), capture_output=True, text=True,
                       timeout=1500)
    assert r.returncode == 0, r.stderr[-3000:]
    assert "HERMETIC_OK" in r.stdout


def _load_bench():
    spec = importlib.util.spec_from_file_location(
        "bench_mod", os.path.join(REPO, "bench.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_bench_unavailable_emits_json(monkeypatch, capsys):
    """When every backend probe fails, bench.main() prints ONE parseable JSON
    line with an explicit 'unavailable' marker and returns (no traceback)."""
    bench = _load_bench()

    def probe_always_hangs(*a, **kw):
        raise subprocess.TimeoutExpired(cmd="probe", timeout=kw.get("timeout", 0))

    monkeypatch.setattr(bench.subprocess if hasattr(bench, "subprocess")
                        else subprocess, "run", probe_always_hangs)
    monkeypatch.setenv("VQGAN_BENCH_WAIT_S", "1")
    bench.main()
    out = capsys.readouterr().out.strip().splitlines()
    result = json.loads(out[-1])
    assert "unavailable" in result
    assert result["value"] == 0.0 and result["vs_baseline"] == 0.0
    assert result["unit"] == "images/sec/chip"


def test_bench_unavailable_embeds_last_good(monkeypatch, capsys, tmp_path):
    """A tunnel outage at driver time embeds the repo-resident last-good
    flagship record (labeled evidence) WITHOUT substituting it into 'value'
    — the honest 0.0 stays the measurement of record."""
    bench = _load_bench()
    snap = {"metric": bench.METRIC, "value": 88.61,
            "unit": "images/sec/chip", "vs_baseline": 1.099,
            "measured_at": "2026-08-20T05:00:00Z"}
    p = tmp_path / "lastgood.json"
    p.write_text(json.dumps(snap))
    monkeypatch.setattr(bench, "LAST_GOOD_PATH", str(p))
    bench._emit_unavailable("tunnel outage")
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["value"] == 0.0 and out["vs_baseline"] == 0.0
    assert out["last_good"]["value"] == 88.61
    assert out["last_good"]["measured_at"] == "2026-08-20T05:00:00Z"

    # no snapshot file -> no last_good key (and no crash)
    monkeypatch.setattr(bench, "LAST_GOOD_PATH", str(tmp_path / "missing"))
    bench._emit_unavailable("tunnel outage")
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert "last_good" not in out and out["value"] == 0.0


def test_bench_orchestrator_merges_legs(monkeypatch, capsys):
    """The driver-facing orchestrator strips the internal _on_tpu marker,
    merges per-leg subprocess JSON into one line, and keeps a failed
    secondary leg as an inline error string (never fatal)."""
    bench = _load_bench()
    legs = {
        "flagship": {"metric": bench.METRIC, "value": 88.6,
                     "unit": "images/sec/chip", "vs_baseline": 1.099,
                     "anchor": {"ips": 80.6}, "_on_tpu": True},
        "ema_vqvae": {"leg": "ema_vqvae", "value": 202.3},
        "standard_vqvae": {"leg": "standard_vqvae", "value": 202.5},
        "entropy_vqvae": {"leg": "entropy_vqvae", "value": 201.6},
        "gan_b32_plain": {"error": "error: leg gan_b32_plain rc=1: boom"},
    }
    monkeypatch.setattr(bench, "_wait_for_backend", lambda *a, **kw: True)
    monkeypatch.setattr(bench, "_run_leg_subprocess",
                        lambda name, timeout_s: legs[name])
    monkeypatch.setenv("VQGAN_BENCH_SECONDARY", "1")
    monkeypatch.delenv("VQGAN_BENCH_ACCUM", raising=False)
    bench.main()
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["value"] == 88.6
    assert "_on_tpu" not in out
    assert out["secondary"]["ema_vqvae"] == 202.3
    assert out["secondary"]["gan_b32_plain"].startswith("error:")


def test_bench_wait_for_backend_success(monkeypatch):
    bench = _load_bench()

    class _OK:
        returncode = 0
        stderr = ""

    monkeypatch.setattr(subprocess, "run", lambda *a, **kw: _OK())
    assert bench._wait_for_backend(max_wait_s=5) is True


def test_bench_flagship_line_precedes_secondary_legs(monkeypatch, capsys):
    """Round-5 contract (BENCH_r04 rc=124/parsed=null): the flagship JSON
    line must be ON STDOUT before any secondary leg starts, so a driver kill
    mid-secondary still leaves one parseable record. The final (enriched)
    line must repeat the flagship fields."""
    bench = _load_bench()
    seen_at_first_secondary = []
    captured = []

    def fake_leg(name, timeout_s):
        if name == "flagship":
            return {"metric": bench.METRIC, "value": 88.6,
                    "unit": "images/sec/chip", "vs_baseline": 1.099,
                    "_on_tpu": True}
        if not seen_at_first_secondary:
            captured.append(capsys.readouterr().out)
            seen_at_first_secondary.append("".join(captured))
        return {"leg": name, "value": 200.0}

    monkeypatch.setattr(bench, "_wait_for_backend", lambda *a, **kw: True)
    monkeypatch.setattr(bench, "_run_leg_subprocess", fake_leg)
    monkeypatch.setenv("VQGAN_BENCH_SECONDARY", "1")
    monkeypatch.delenv("VQGAN_BENCH_ACCUM", raising=False)
    monkeypatch.delenv("VQGAN_BENCH_DEADLINE_S", raising=False)
    bench.main()
    captured.append(capsys.readouterr().out)

    # a complete flagship record was on stdout before the first secondary leg
    assert seen_at_first_secondary, "no secondary leg ran"
    early_lines = [json.loads(line) for line
                   in seen_at_first_secondary[0].strip().splitlines()
                   if line.startswith("{")]
    assert len(early_lines) == 1
    assert early_lines[0]["value"] == 88.6
    assert early_lines[0]["vs_baseline"] == 1.099
    assert "_on_tpu" not in early_lines[0]

    # final enriched line repeats the flagship fields + secondary
    final = json.loads("".join(captured).strip().splitlines()[-1])
    assert final["value"] == 88.6 and "secondary" in final
    # first and last lines are BOTH valid driver records
    first = json.loads("".join(captured).strip().splitlines()[0])
    assert first["value"] == final["value"]
    assert first["vs_baseline"] == final["vs_baseline"]


def test_bench_secondary_legs_budget_skipped(monkeypatch, capsys):
    """Secondary legs are skipped with an in-JSON marker once the wall budget
    is exhausted — they can never push the process past the driver's kill."""
    bench = _load_bench()
    ran = []

    def fake_leg(name, timeout_s):
        ran.append(name)
        return {"metric": bench.METRIC, "value": 88.6,
                "unit": "images/sec/chip", "vs_baseline": 1.099,
                "_on_tpu": True}

    monkeypatch.setattr(bench, "_wait_for_backend", lambda *a, **kw: True)
    monkeypatch.setattr(bench, "_run_leg_subprocess", fake_leg)
    monkeypatch.setenv("VQGAN_BENCH_SECONDARY", "1")
    monkeypatch.setenv("VQGAN_BENCH_DEADLINE_S", "0")  # budget already gone
    bench.main()
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert ran == ["flagship"]
    assert all(str(v).startswith("skipped:")
               for v in out["secondary"].values())


def test_bench_gan_b32_plain_contamination_annotated(monkeypatch, capsys):
    """The serial-host gan_b32_plain reading ships annotated, never as a bare
    number the repo's own docs say to distrust (PERFORMANCE.md)."""
    bench = _load_bench()
    legs = {
        "flagship": {"metric": bench.METRIC, "value": 88.6,
                     "unit": "images/sec/chip", "vs_baseline": 1.099,
                     "_on_tpu": True},
        "ema_vqvae": {"leg": "ema_vqvae", "value": 202.3},
        "standard_vqvae": {"leg": "standard_vqvae", "value": 202.5},
        "entropy_vqvae": {"leg": "entropy_vqvae", "value": 201.6},
        "gan_b32_plain": {"leg": "gan_b32_plain", "value": 82.0},
    }
    monkeypatch.setattr(bench, "_wait_for_backend", lambda *a, **kw: True)
    monkeypatch.setattr(bench, "_run_leg_subprocess",
                        lambda name, timeout_s: legs[name])
    monkeypatch.setenv("VQGAN_BENCH_SECONDARY", "1")
    monkeypatch.delenv("VQGAN_BENCH_ACCUM", raising=False)
    monkeypatch.delenv("VQGAN_BENCH_DEADLINE_S", raising=False)
    bench.main()
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    leg = out["secondary"]["gan_b32_plain"]
    assert leg["value"] == 82.0 and "note" in leg
    assert out["secondary"]["ema_vqvae"] == 202.3  # others stay bare


def test_bench_probe_budget_escalates(monkeypatch):
    """Probe timeouts escalate 60 → 120 → 240 (round-4 burned 8 min on two
    flat 240s hangs before any measurement)."""
    bench = _load_bench()
    budgets = []

    def fake_run(*a, **kw):
        budgets.append(kw["timeout"])
        if len(budgets) < 4:
            raise subprocess.TimeoutExpired(cmd="probe", timeout=kw["timeout"])

        class _OK:
            returncode = 0
            stderr = ""
        return _OK()

    monkeypatch.setattr(subprocess, "run", fake_run)
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    assert bench._wait_for_backend(max_wait_s=100000) is True
    assert budgets == [60.0, 120.0, 240.0, 240.0]


def test_bench_late_crash_reemits_flagship(monkeypatch, capsys):
    """A crash AFTER the flagship line is printed (malformed env int(), a
    subprocess OSError mid-secondary, ...) must re-emit the measured flagship
    record — annotated — as the final line, never an unavailable 0.0: both
    in-repo consumers (tools/chipq.sh, tools/bench_sweep.sh) take `tail -1`,
    which would otherwise lose the measurement (the BENCH_r04 data-loss mode
    the round-5 restructure exists to prevent)."""
    bench = _load_bench()

    def fake_leg(name, timeout_s):
        if name == "flagship":
            return {"metric": bench.METRIC, "value": 88.6,
                    "unit": "images/sec/chip", "vs_baseline": 1.099,
                    "_on_tpu": True}
        raise OSError("ENOMEM mid-secondary")

    monkeypatch.setattr(bench, "_wait_for_backend", lambda *a, **kw: True)
    monkeypatch.setattr(bench, "_run_leg_subprocess", fake_leg)
    monkeypatch.setenv("VQGAN_BENCH_SECONDARY", "1")
    monkeypatch.delenv("VQGAN_BENCH_ACCUM", raising=False)
    monkeypatch.delenv("VQGAN_BENCH_DEADLINE_S", raising=False)
    bench._guarded_main()
    lines = [json.loads(l) for l
             in capsys.readouterr().out.strip().splitlines()
             if l.startswith("{")]
    assert lines[-1]["value"] == 88.6
    assert lines[-1]["vs_baseline"] == 1.099
    assert "unavailable" not in lines[-1]
    assert "secondary_error" in lines[-1]

    # pre-flagship crash still emits the honest unavailable marker
    def fail_fast(name, timeout_s):
        raise RuntimeError("probe exploded")

    bench2 = _load_bench()
    monkeypatch.setattr(bench2, "_wait_for_backend", lambda *a, **kw: True)
    monkeypatch.setattr(bench2, "_run_leg_subprocess", fail_fast)
    bench2._guarded_main()
    last = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert last["value"] == 0.0 and "unavailable" in last


def test_chipq_leg_env_preserves_value_commas(tmp_path):
    """chipq.sh leg-spec parsing: a comma starts a new assignment only before
    an UPPERCASE NAME= — commas inside a value (multi-flag lowercase XLA
    bundles, the historical chipq_r4 bundle legs) must survive intact."""
    env = dict(os.environ,
               CHIPQ_ECHO="1", PRECOMPILE="0", VALIDATE="0",
               RESULTS=str(tmp_path / "results.txt"),
               LOGDIR=str(tmp_path / "logs"))
    spec = ("bundle:VQVAE_TPU_XLA_OPTS=xla_a=1,xla_b=true,"
            "VQGAN_BENCH_ACCUM=4")
    r = subprocess.run(["bash", os.path.join(REPO, "tools", "chipq.sh"),
                        spec], env=env, capture_output=True, text=True,
                       timeout=120, cwd=REPO)
    assert r.returncode == 0, r.stderr
    log = (tmp_path / "logs" / "leg_bundle.log").read_text()
    assert "VQVAE_TPU_XLA_OPTS=xla_a=1,xla_b=true" in log
    assert "VQGAN_BENCH_ACCUM=4" in log
    # the broken split would have emitted the bundle's tail as its own word
    assert " xla_b=true " not in log


def test_bench_secondary_leg_hang_capped(monkeypatch, capsys):
    """A tunnel black-hole mid-secondary-leg must not stretch the process
    toward the driver's kill window: each secondary leg's subprocess timeout
    is capped at 2x the leg estimate (observed 2026-08-20: gan_b32_plain
    hung for its entire 1447s remaining budget)."""
    bench = _load_bench()
    timeouts = {}

    def fake_leg(name, timeout_s):
        timeouts[name] = timeout_s
        if name == "flagship":
            return {"metric": bench.METRIC, "value": 88.6,
                    "unit": "images/sec/chip", "vs_baseline": 1.099,
                    "_on_tpu": True}
        return {"leg": name, "value": 200.0}

    monkeypatch.setattr(bench, "_wait_for_backend", lambda *a, **kw: True)
    monkeypatch.setattr(bench, "_run_leg_subprocess", fake_leg)
    monkeypatch.setenv("VQGAN_BENCH_SECONDARY", "1")
    monkeypatch.setenv("VQGAN_BENCH_LEG_EST_S", "480")
    monkeypatch.delenv("VQGAN_BENCH_LEG_TIMEOUT_S", raising=False)
    monkeypatch.delenv("VQGAN_BENCH_ACCUM", raising=False)
    monkeypatch.delenv("VQGAN_BENCH_DEADLINE_S", raising=False)
    bench.main()
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert set(out["secondary"]) == set(bench.SECONDARY_LEGS)
    for name in bench.SECONDARY_LEGS:
        assert timeouts[name] <= 2 * 480.0, (name, timeouts[name])
    # the flagship leg keeps its own (much larger) budget floor
    assert timeouts["flagship"] >= 1200.0
