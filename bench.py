"""Benchmark: train images/sec/chip for 256x256 VQGAN training.

Measures the full flagship workload — gumbel VQGAN training step with LPIPS
(VGG16) perceptual loss, StyleGAN2 discriminator update, and the R1 cadence
(every 16 steps) — on synthetic data, isolating device compute + input
transfer from disk I/O. This matches BASELINE.md's throughput target
definition ("train images/sec/chip for 256^2 VQGAN").

Baseline anchor: the reference publishes NO throughput numbers (BASELINE.md).
``vs_baseline`` is computed against a FLOP-calibrated A100 proxy for this
exact workload: XLA cost analysis gives 49.5 TFLOP/step amortized (1.55
TFLOP/image). The anchor's one free parameter is the A100 MFU assumed for
the eager-torch Lightning reference; round 4's lever-exhaustion evidence
(every candidate measured on silicon, per-op profile at rooflines —
BASELINE.md "Why ~70% v5e MFU is this workload's measured ceiling") retired
the provisional 45% placeholder for the still-generous-end point estimate
of public torch-AMP conv-GAN results, 40% MFU → 125 TFLOP/s → **~80.6
img/s/A100**. For transparency the JSON line also carries the old 45%
anchor ratio (``anchor.vs_45pct_mfu_anchor``). Full derivation + sensitivity
table in BASELINE.md; overridable via $VQGAN_A100_BASELINE_IPS.

Prints the flagship JSON line
  {"metric": "...", "value": N, "unit": "images/sec/chip", "vs_baseline": N}
IMMEDIATELY after the flagship leg completes, then (budget permitting) runs
the secondary legs and prints the same line enriched with a "secondary"
field. First and last JSON lines on stdout are both valid records — the
early emission is deliberate, so a driver kill during secondary legs can
never lose the flagship number (BENCH_r04 lesson).

Process model: the driver-facing invocation (`python bench.py`) is a thin
orchestrator that never touches the accelerator itself — each leg (flagship
+ every secondary config) runs in its OWN subprocess (`bench.py --leg NAME`)
with a dedicated process and a quiet host. Round 4 measured why this
matters on a 1-core host: the unaccumulated GAN leg reads 88.3 img/s in a
dedicated process but 82.0 when run last in a process that already holds
four other trainers (host-side context, not step time — PERFORMANCE.md
"Other configurations"). The persistent compile cache makes the per-leg
re-init cheap.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

METRIC = ("train images/sec/chip, 256^2 gumbel VQGAN "
          "(LPIPS + StyleGAN2 D + R1/16)")

SECONDARY_LEGS = ("ema_vqvae", "standard_vqvae", "entropy_vqvae",
                  "gan_b32_plain")

# every successful ON-CHIP flagship leg snapshots its record here; the
# unavailable path embeds it (labeled, never substituted into "value") so a
# tunnel outage at driver time still leaves evidence of the real measured
# number alongside the honest 0.0
LAST_GOOD_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              "docs", "BENCH_LASTGOOD.json")

# set by main() the moment the flagship JSON line is printed; the late-crash
# handler re-emits this record (annotated) so the final stdout line can never
# downgrade a measured flagship number to an unavailable 0.0
_FLAGSHIP_RECORD = None


def _emit_unavailable(reason: str) -> None:
    """One parseable JSON line instead of a traceback when the accelerator
    is unreachable (round-2 BENCH crashed rc=1 on a dead axon tunnel)."""
    line = {"metric": METRIC, "value": 0.0,
            "unit": "images/sec/chip", "vs_baseline": 0.0,
            "unavailable": reason}
    try:
        with open(LAST_GOOD_PATH) as f:
            line["last_good"] = json.load(f)
    except Exception:
        pass
    print(json.dumps(line))


def _wait_for_backend(max_wait_s: float) -> bool:
    """Wait (bounded) until JAX backend init succeeds.

    The axon tunnel has 15-60+ min outages during which backend init either
    raises UNAVAILABLE or — worse — blocks forever. A hung init cannot be
    cancelled in-process, so each probe runs in a SUBPROCESS under a timeout;
    only after a probe executes a real device op does this process touch the
    backend itself.

    Probe budgets ESCALATE (60s → 120s → 240s): round 4's driver record
    (BENCH_r04.json rc=124) burned 8 min on two flat 240s probe hangs before
    any measurement; a healthy tunnel answers in seconds, so the first probe
    is cheap and longer budgets are granted only after a hang — evidence of
    a live-but-slow tunnel worth waiting for.
    """
    # the probe honors the same CPU-forcing knob as the legs, so a
    # VQVAE_TPU_PLATFORM=cpu bench run never touches the tunnel at all
    probe = ("import os, jax, jax.numpy as jnp; "
             "p = os.environ.get('VQVAE_TPU_PLATFORM'); "
             "p and jax.config.update('jax_platforms', p); "
             "x = jnp.ones((128, 128)); print(float((x @ x).sum()))")
    deadline = time.monotonic() + max_wait_s
    attempt = 0
    while True:
        attempt += 1
        probe_timeout_s = (60.0, 120.0)[attempt - 1] if attempt <= 2 else 240.0
        budget = min(probe_timeout_s, max(deadline - time.monotonic(), 30.0))
        try:
            r = subprocess.run([sys.executable, "-c", probe],
                               timeout=budget, capture_output=True, text=True)
            if r.returncode == 0:
                if attempt > 1:
                    print(f"[bench] backend up after {attempt} probes",
                          file=sys.stderr)
                return True
            err = (r.stderr or "").strip().splitlines()
            print(f"[bench] probe {attempt} rc={r.returncode}: "
                  f"{err[-1] if err else '?'}", file=sys.stderr)
        except subprocess.TimeoutExpired:
            print(f"[bench] probe {attempt} hung >{budget:.0f}s (tunnel "
                  "black-hole)", file=sys.stderr)
        if time.monotonic() >= deadline:
            return False
        time.sleep(min(60.0, max(deadline - time.monotonic(), 1.0)))


def main():
    """Driver-facing orchestrator: backend-silent in-process; every
    measurement runs in its own dedicated subprocess (see module docstring).

    Stdout contract (round-5 restructure — BENCH_r04 was rc=124/parsed=null
    because the single JSON line was held back until all five legs finished):
    the FLAGSHIP JSON line is printed and flushed the moment the flagship leg
    returns; secondary legs then run budget-aware, and a second, enriched
    line (same flagship fields + "secondary") follows. A consumer parsing
    either the first or the last JSON line gets a valid record; a mid-run
    kill after the flagship leg still leaves one parseable line on stdout.
    """
    t_start = time.monotonic()
    # total wall budget for this process; secondary legs are skipped (with an
    # in-JSON marker) rather than allowed to push past it. Must sit well
    # under the driver's own kill timeout.
    deadline_s = float(os.environ.get("VQGAN_BENCH_DEADLINE_S", 3600))

    # bounded wait-and-retry BEFORE any backend touch; the driver invokes
    # this file directly, so outage resilience must live here (not in
    # tools/bench_sweep.sh)
    max_wait = float(os.environ.get("VQGAN_BENCH_WAIT_S", 1200))
    if not _wait_for_backend(max_wait):
        _emit_unavailable(
            f"accelerator backend init failed/hung for {max_wait:.0f}s "
            "(axon tunnel outage); no measurement taken")
        return

    # flagship leg (cold compiles can take ~10 min even cache-warm-adjacent):
    # gets whatever remains of the budget, floored so a slow backend wait
    # can't starve the one measurement that matters
    flagship_timeout = float(os.environ.get(
        "VQGAN_BENCH_LEG_TIMEOUT_S",
        max(deadline_s - (time.monotonic() - t_start) - 120.0, 1200.0)))
    out = _run_leg_subprocess("flagship", timeout_s=flagship_timeout)
    if "error" in out:
        _emit_unavailable(out["error"])
        return
    if out.get("precompile"):
        print(json.dumps(out), flush=True)
        return
    on_tpu = bool(out.pop("_on_tpu", False))
    result = out
    # the driver-facing record, on stdout BEFORE any secondary work begins;
    # remembered so a late crash re-emits IT (not an unavailable marker) as
    # the final line — both first and last JSON lines must stay valid records
    global _FLAGSHIP_RECORD
    _FLAGSHIP_RECORD = dict(result)
    print(json.dumps(result), flush=True)

    # secondary (non-flagship) configs — regression tracking for the non-GAN
    # paths (PERFORMANCE.md "Other configurations"). Each in a dedicated
    # subprocess so no leg measures another leg's host context; each gated on
    # the remaining wall budget.
    if os.environ.get("VQGAN_BENCH_SECONDARY", "1") == "1" and on_tpu:
        est_leg_s = float(os.environ.get("VQGAN_BENCH_LEG_EST_S", 480))
        accum = int(os.environ.get("VQGAN_BENCH_ACCUM", 8))
        legs = [l for l in SECONDARY_LEGS
                if l != "gan_b32_plain" or accum > 1]
        secondary = {}
        for name in legs:
            remaining = deadline_s - (time.monotonic() - t_start)
            if remaining < est_leg_s:
                secondary[name] = (f"skipped: {remaining:.0f}s left of "
                                   f"{deadline_s:.0f}s budget")
                continue
            # a secondary-path failure must never lose the flagship number;
            # and a tunnel black-hole MID-LEG must not stretch the process
            # toward the driver's kill window (observed 2026-08-20:
            # gan_b32_plain hung for its entire 1447s remaining budget, so
            # the process ran right up to the deadline) — cap each secondary
            # leg at 2x its estimate unless explicitly overridden
            leg_cap = float(os.environ.get("VQGAN_BENCH_LEG_TIMEOUT_S",
                                           2.0 * est_leg_s))
            leg = _run_leg_subprocess(name, timeout_s=min(remaining, leg_cap))
            secondary[name] = leg.get("error", leg.get("value"))
        if "gan_b32_plain" in secondary and isinstance(
                secondary["gan_b32_plain"], (int, float)):
            # serial-host contamination: earlier legs heat this 1-core host;
            # the dedicated-process isolated reading is 88.29 img/s
            # (PERFORMANCE.md "Other configurations") — annotate so the
            # in-line number is never mistaken for the leg's true value
            secondary["gan_b32_plain"] = {
                "value": secondary["gan_b32_plain"],
                "note": "serial-host reading; trust the isolated 88.29 "
                        "(PERFORMANCE.md)"}
        result["secondary"] = secondary
        print(json.dumps(result), flush=True)


def _run_leg_subprocess(name: str, timeout_s: float) -> dict:
    """Run one bench leg in a dedicated subprocess; return its JSON dict or
    {"error": ...}. Leg stderr is forwarded for diagnosability."""
    cmd = [sys.executable, os.path.abspath(__file__), "--leg", name]
    try:
        r = subprocess.run(cmd, timeout=timeout_s, capture_output=True,
                           text=True)
    except subprocess.TimeoutExpired:
        return {"error": f"error: leg {name} timed out after "
                         f"{timeout_s:.0f}s"}
    if r.stderr:
        sys.stderr.write(r.stderr)
    if r.returncode != 0:
        tail = (r.stderr or "").strip().splitlines()
        return {"error": (f"error: leg {name} rc={r.returncode}: "
                          f"{tail[-1] if tail else '?'}")[:300]}
    for line in reversed((r.stdout or "").strip().splitlines()):
        if line.startswith("{"):
            try:
                return json.loads(line)
            except json.JSONDecodeError:
                break
    return {"error": f"error: leg {name} produced no JSON line"}


def _run_leg(name: str) -> None:
    """In-process single-leg measurement (the subprocess side). Touches the
    backend directly — the orchestrator has already probed tunnel health."""
    import jax
    import jax.numpy as jnp

    # same CPU-forcing knob the CLIs honor (CLAUDE.md: the JAX_PLATFORMS env
    # var is ignored under axon) — lets an offline box drive the bench
    # end-to-end on the tiny CPU-fallback config without touching the tunnel
    plat = os.environ.get("VQVAE_TPU_PLATFORM")
    if plat:
        jax.config.update("jax_platforms", plat)

    # persistent compile cache: 256^2 GAN-step compiles are expensive
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.expanduser("~/.cache/jax_comp_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
    except Exception:
        pass

    raw, image_size, batch, accum, on_tpu = _flagship_raw(jax)
    if name == "flagship":
        _bench_flagship(raw, image_size, batch, accum, on_tpu, jnp)
    elif name == "gan_b32_plain":
        print(json.dumps({"leg": name,
                          "value": _bench_gan_plain(raw, image_size, jnp)}))
    else:
        q_type = {"ema_vqvae": "ema", "standard_vqvae": "standard",
                  "entropy_vqvae": "entropy"}[name]
        print(json.dumps({"leg": name,
                          "value": _bench_plain(raw, q_type, image_size,
                                                jnp)}))


def _flagship_raw(jax):
    """The flagship config dict (published gumbel-VQGAN recipe) + leg-shared
    sizing, derived from the live backend."""
    on_tpu = jax.default_backend() in ("tpu", "axon")
    image_size = 256 if on_tpu else 32
    # CPU fallback must respect the GroupNorm(32) divisibility floor
    channels = 128 if on_tpu else 32
    batch = int(os.environ.get("VQGAN_BENCH_BATCH", 32 if on_tpu else 8))

    raw = {
        "image_size": image_size,
        "autoencoder": {"channels": channels, "num_res_blocks": 2,
                        "channel_multipliers": [1, 2, 2, 4]},
        "quantizer": {"num_embeddings": 1024, "embedding_dim": 256,
                      "type": "gumbel", "reinit_every_n_epochs": None,
                      "params": {"straight_through": False, "temp": 1.0,
                                 "kl_cost": 0.00859375,
                                 "kl_warmup_epochs": 0.48,
                                 "temp_decay_epochs": 15,
                                 "temp_final": 0.0625}},
        "loss": {"l1_weight": 0.8, "l2_weight": 0.2, "perc_weight": 1.0,
                 "adversarial_params": {"start_epoch": 0,
                                        "loss_type": "non-saturating",
                                        "g_weight": 0.1, "use_adaptive": False,
                                        "r1_reg_weight": 10.0,
                                        "r1_reg_every": 16}},
        "training": {"cumulative_bs": 256, "base_lr": 1e-4,
                     "betas": [0.0, 0.99], "eps": 1e-8, "weight_decay": 1e-4,
                     "decay_epochs": 250, "max_epochs": 300},
    }
    if not on_tpu:
        raw["autoencoder"]["channel_multipliers"] = [1, 2]
        raw["quantizer"]["num_embeddings"] = 64
        raw["quantizer"]["embedding_dim"] = 16

    # grad accumulation: 8 micro-batches of 32 = the published cumulative 256
    # recipe on ONE chip — and measured slightly faster per image than the
    # plain b32 step (fixed per-step overheads amortize)
    accum = int(os.environ.get("VQGAN_BENCH_ACCUM", 8 if on_tpu else 1))
    if accum > 1:
        batch = batch * accum
        raw["training"]["grad_accum_steps"] = accum
    return raw, image_size, batch, accum, on_tpu


def _bench_flagship(raw, image_size, batch, accum, on_tpu, jnp):
    import jax
    import numpy as np

    from vqvae_tpu.config import parse_config
    from vqvae_tpu.train.loop import Trainer

    cfg = parse_config(raw)

    # default: remat OFF — the full 256^2 b32-micro GAN step fits in 16 GB
    # HBM and runs ~15% faster without recompute ("1" to force, "auto" for
    # the Trainer's image-size heuristic)
    remat_env = os.environ.get("VQGAN_BENCH_REMAT", "0")
    trainer = Trainer(cfg=cfg, learning_rate=1e-4, seed=0,
                      steps_per_epoch=1000, mesh=None,
                      compute_dtype=jnp.bfloat16,
                      remat=None if remat_env == "auto" else remat_env == "1")
    state = trainer.init_state()

    images = np.random.RandomState(0).randint(
        0, 255, (batch, image_size, image_size, 3), np.uint8)
    # pre-stage the synthetic batch on device: host->device overlap is the
    # input pipeline's job (benchmarked separately in tools/bench_input.py);
    # this measures the train step itself, and the axon tunnel serializes
    # uploads that a real TPU host overlaps
    batch_dict = {"image": jax.device_put(jnp.asarray(images))}

    # VQGAN_BENCH_PRECOMPILE=1: populate the persistent compile cache for
    # this env-flag configuration WITHOUT executing any step (AOT
    # lower+compile only — no activation memory), then exit. Lets several
    # variant compiles overlap on the remote compile helper while the chip
    # stays free for timed runs.
    if os.environ.get("VQGAN_BENCH_PRECOMPILE", "0") == "1":
        imgs = batch_dict["image"]
        for name in ("train_gan", "train_gan_r1"):
            fn = getattr(trainer.steps, name)
            t0 = time.perf_counter()
            fn.lower(state, imgs).compile()
            print(f"[precompile] {name}: {time.perf_counter() - t0:.1f}s",
                  file=sys.stderr)
        # keep the one-JSON-line contract's keys present (value=None marks
        # "no measurement" for any consumer parsing every bench line)
        print(json.dumps({"metric": METRIC, "value": None, "unit":
                          "images/sec/chip", "vs_baseline": None,
                          "precompile": True}))
        return

    # warmup / compile (epoch 0 >= start_epoch 0 => full GAN step incl. R1).
    # NOTE: timing uses an explicit host fetch (float(...)) as the completion
    # barrier — under the axon TPU tunnel, block_until_ready can return while
    # executions are still pipelined, so only a device->host readback of a
    # value that transitively depends on every step is a true fence.
    for _ in range(3):
        state, metrics = trainer.train_step(state, batch_dict, epoch=0)
    _ = float(metrics["loss"])

    # timed: full R1 windows (16 steps) so the cadence is amortized
    # realistically; steps are chained through `state`, one fetch per window.
    # median of 3 windows — single-window tunnel noise is ~±2%.
    n_steps = 16
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(n_steps):
            state, metrics = trainer.train_step(state, batch_dict, epoch=0)
        _ = float(metrics["loss"])
        times.append(time.perf_counter() - t0)
    dt = sorted(times)[1]

    ips = batch * n_steps / dt
    override = os.environ.get("VQGAN_A100_BASELINE_IPS")
    baseline = float(override) if override else 80.6

    result = {
        "metric": METRIC,
        "value": round(ips, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(ips / baseline, 3),
        # anchor transparency (BASELINE.md "Anchor sensitivity"): the proxy's
        # one free parameter is the assumed reference A100 MFU. The anchor is
        # FROZEN as of round 5 (only a measured A100 number via
        # $VQGAN_A100_BASELINE_IPS may replace it); the full sensitivity row
        # rides in every line so no denominator change can hide in one ratio.
        # With an override the anchor is labeled as measured — the MFU field
        # describes only the proxy denominator, never a supplied measurement.
        "anchor": {"ips": baseline,
                   **({"source": "VQGAN_A100_BASELINE_IPS override "
                                 "(measured reference)"} if override else
                      {"source": "40pct-mfu-proxy", "assumed_a100_mfu": 0.40}),
                   "vs_35pct_mfu_anchor": round(ips / 70.4, 3),
                   "vs_45pct_mfu_anchor": round(ips / 90.0, 3)},
        # internal: tells the orchestrator whether secondary legs apply
        # (stripped before the final line is printed)
        "_on_tpu": on_tpu,
    }

    if on_tpu:
        snap = {k: v for k, v in result.items() if not k.startswith("_")}
        snap["measured_at"] = time.strftime("%Y-%m-%dT%H:%M:%SZ",
                                            time.gmtime())
        try:
            with open(LAST_GOOD_PATH, "w") as f:
                json.dump(snap, f, indent=1)
                f.write("\n")
        except Exception as exc:  # never let bookkeeping break the record
            print(f"[bench] last-good snapshot failed: {exc}",
                  file=sys.stderr)

    print(json.dumps(result))


def _bench_gan_plain(base_raw, image_size: int, jnp):
    """img/s for the UNACCUMULATED 256^2 GAN step (b32, bf16, no remat) —
    the same full workload as the flagship leg minus the micro-batch scan."""
    import copy
    import time

    import jax
    import numpy as np

    from vqvae_tpu.config import parse_config
    from vqvae_tpu.train.loop import Trainer

    raw = copy.deepcopy(base_raw)
    raw["training"].pop("grad_accum_steps", None)
    cfg = parse_config(raw)

    batch = 32
    trainer = Trainer(cfg=cfg, learning_rate=1e-4, seed=0,
                      steps_per_epoch=1000, mesh=None,
                      compute_dtype=jnp.bfloat16, remat=False)
    state = trainer.init_state()
    images = np.random.RandomState(0).randint(
        0, 255, (batch, image_size, image_size, 3), np.uint8)
    batch_dict = {"image": jax.device_put(jnp.asarray(images))}

    for _ in range(3):
        state, metrics = trainer.train_step(state, batch_dict, epoch=0)
    _ = float(metrics["loss"])

    n_steps, times = 16, []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(n_steps):
            state, metrics = trainer.train_step(state, batch_dict, epoch=0)
        _ = float(metrics["loss"])
        times.append(time.perf_counter() - t0)
    return round(batch * n_steps / sorted(times)[1], 2)


def _bench_plain(base_raw, q_type: str, image_size: int, jnp):
    """img/s for a non-GAN 256^2 VQ-VAE train step (b32, bf16, no remat)."""
    import copy
    import time

    import jax
    import numpy as np

    from vqvae_tpu.config import parse_config
    from vqvae_tpu.train.loop import Trainer

    raw = copy.deepcopy(base_raw)
    raw.pop("loss", None)
    raw["training"].pop("grad_accum_steps", None)
    raw["quantizer"]["type"] = q_type
    raw["quantizer"]["params"] = {
        "standard": {"commitment_cost": 0.25},
        "ema": {"commitment_cost": 0.25, "decay": 0.95, "epsilon": 1e-5},
        # example_confs/entropy_vqvae.yaml
        "entropy": {"ent_loss_ratio": 0.1, "ent_temperature": 0.01,
                    "ent_loss_type": "softmax", "commitment_cost": 0.25},
    }[q_type]
    cfg = parse_config(raw)

    batch = 32
    trainer = Trainer(cfg=cfg, learning_rate=1e-4, seed=0,
                      steps_per_epoch=1000, mesh=None,
                      compute_dtype=jnp.bfloat16, remat=False)
    state = trainer.init_state()
    images = np.random.RandomState(0).randint(
        0, 255, (batch, image_size, image_size, 3), np.uint8)
    batch_dict = {"image": jax.device_put(jnp.asarray(images))}

    for _ in range(3):
        state, metrics = trainer.train_step(state, batch_dict, epoch=0)
    _ = float(metrics["loss"])

    n_steps, times = 16, []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(n_steps):
            state, metrics = trainer.train_step(state, batch_dict, epoch=0)
        _ = float(metrics["loss"])
        times.append(time.perf_counter() - t0)
    return round(batch * n_steps / sorted(times)[1], 2)


def _guarded_main() -> None:
    """main() with the stdout contract enforced on ANY late failure: the
    LAST JSON line must be a valid record. If the flagship line already went
    out, re-emit the measured record (annotated) so last-line consumers
    (tools/chipq.sh, tools/bench_sweep.sh `tail -1`) never trade a real
    measurement for an unavailable 0.0; only a pre-flagship crash emits the
    unavailable marker. Traceback goes to stderr either way."""
    try:
        main()
    except Exception as exc:  # noqa: BLE001
        import traceback
        traceback.print_exc()
        err = f"bench failed: {type(exc).__name__}: {exc}"[:300]
        if _FLAGSHIP_RECORD is not None:
            rec = dict(_FLAGSHIP_RECORD)
            rec["secondary_error"] = err
            print(json.dumps(rec), flush=True)
        else:
            _emit_unavailable(err)


if __name__ == "__main__":
    if "--leg" in sys.argv:
        # subprocess side: let failures propagate as rc!=0 + stderr traceback
        # — the orchestrator converts them into an in-line error marker
        _run_leg(sys.argv[sys.argv.index("--leg") + 1])
    else:
        _guarded_main()
