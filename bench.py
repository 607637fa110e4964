"""Benchmark: CycleGAN 128^3-patch train-step throughput per chip.

Prints ONE JSON line per metric: {"metric", "value", "unit", "vs_baseline"}.

The tracked metric (BASELINE.json) is 128^3 patches/sec/chip for the full
VAN-GAN train step (dual ResU-Net generators + dual PatchGAN discriminators,
cycle + clDice + SSIM + LSGAN losses, all four optimizers, bf16 compute,
fused Pallas clDice kernels, per-network remat). Secondary metric: full-volume
sliding-window inference Mvoxels/s (BASELINE config 3).

Harness hardening (round-2 VERDICT item 1 — the round-2 number was real but
the harness recorded a silent failure; round-3 item 1 — the round-3 run was
killed by the driver's wall cap before anything flushed):
- HARD TOTAL WALL BUDGET (`VANGAN_BENCH_BUDGET_S`, default 1500 s): every
  probe's timeout is derived from the remaining budget, lower-value probes
  are skipped when the budget is tight, and each metric's JSON line is
  printed AND flushed the moment its probe parses — a driver kill mid-run
  loses only the probes that had not finished;
- the on-chip pytest selftest is NOT in the default path (it burned the
  entire round-3 driver cap); run it explicitly with `--selftest`;
- pre-flight: refuses to start while another TPU-bound process holds the chip
  (waits, then kills the recorded PIDs explicitly — never by pattern);
- each probe runs in a fresh subprocess with FULL stdout/stderr written to
  bench_logs/ and JAX_TRACEBACK_FILTERING=off;
- on failure the last Python traceback (ANSI-stripped, not a 500-char log
  tail) goes to stderr and bench_logs/summary.json, and the probe retries
  once if the budget still allows;
- a primary-metric failure does not abort the inference metric;
- the inference warm-up compiles at the REAL volume shape (max_chunks=1 on
  the actual buffers — the stitcher jit is shape-keyed, so a small warm-up
  volume warms nothing);
- the best primary line is re-printed as the LAST line so a tail-parsing
  driver always sees the headline metric;
- `--force-fail` injects an exception to prove the capture path end-to-end.

Baseline: the reference repo publishes no numbers (BASELINE.md). The
comparison constant below is an engineering estimate of the TF-2.10 reference
on its documented hardware (4x CUDA GPU, global batch 12, main.py:22,71-72):
3-D CycleGAN steps of this size run ~2-4 s on a V100-class GPU, i.e. ~1
patch/sec/GPU. vs_baseline = measured / REF_PATCHES_PER_SEC_PER_CHIP; the
north-star is vs_baseline >= 10 (BASELINE.json:5,11).
"""

import json
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

REF_PATCHES_PER_SEC_PER_CHIP = 1.0  # estimated TF-GPU reference (see docstring)
LOG_DIR = os.path.join(REPO, "bench_logs")

# Hard total wall budget for the default (no-args) run. The driver enforces
# its own cap (round 3 died at rc=124 with NOTHING flushed); everything in
# main() keys its timeout off what remains of this budget.
BUDGET_S = float(os.environ.get("VANGAN_BENCH_BUDGET_S", "1500"))
_T0 = time.monotonic()


def _remaining() -> float:
    return BUDGET_S - (time.monotonic() - _T0)


def _emit(line_obj: dict) -> None:
    """Print one metric JSON line and flush IMMEDIATELY — a driver kill after
    this point cannot lose the number."""
    print(json.dumps(line_obj), flush=True)

_ANSI = re.compile(r"\x1b\[[0-9;]*m")


def _strip_ansi(s: str) -> str:
    return _ANSI.sub("", s)


def extract_traceback(stderr: str, max_chars: int = 4000) -> str:
    """The LAST Python traceback (or error-looking lines) from a stderr blob,
    ANSI-stripped — round 2 died with only log noise in a 500-char tail."""
    text = _strip_ansi(stderr)
    idx = text.rfind("Traceback (most recent call last)")
    if idx >= 0:
        return text[idx:][:max_chars]
    # no traceback header: keep lines that look like errors, else the tail
    err_lines = [
        ln for ln in text.splitlines()
        if re.search(r"\b(Error|Exception|FAILED|Aborted|Killed|RESOURCE_EXHAUSTED)\b", ln)
    ]
    if err_lines:
        return "\n".join(err_lines[-40:])[:max_chars]
    return text[-max_chars:]


def _proc_listing():
    # ps truncates lines to $COLUMNS even when piped (pytest sets it); force
    # full-width output so long cmdlines keep their identifying tails
    env = {**os.environ, "COLUMNS": "100000"}
    out = subprocess.run(
        ["ps", "-wweo", "pid,ppid,etimes,args"], capture_output=True, text=True, env=env
    ).stdout
    return out.splitlines()[1:]


def _ancestors() -> set:
    pids = set()
    pid = os.getpid()
    table = {}
    for ln in _proc_listing():
        parts = ln.split(None, 3)
        if len(parts) >= 2:
            try:
                table[int(parts[0])] = int(parts[1])
            except ValueError:
                continue
    while pid and pid in table:
        pids.add(pid)
        pid = table[pid]
    return pids


def find_tpu_suspects() -> list:
    """(pid, age_s, cmd) for OTHER processes that plausibly hold the chip.

    Matches python processes running this repo's code or jax/pytest — NOT the
    axon tunnel daemon (.tpu_init.py) and never self or ancestors.
    """
    own = _ancestors() | {os.getpid()}
    suspects = []
    for ln in _proc_listing():
        parts = ln.split(None, 3)
        if len(parts) < 4:
            continue
        try:
            pid, _, age = int(parts[0]), int(parts[1]), int(parts[2])
        except ValueError:
            continue
        cmd = parts[3]
        if pid in own or ".tpu_init" in cmd:
            continue
        if "python" not in cmd:
            continue
        # anchored tokens only: a bare 'jax' substring matched any python
        # process with 'jax' in a path or args (e.g. 'pip install jax') and
        # got it killed (review r3); this repo's TPU holders always match one
        # of these
        if re.search(r"vangan|bench\.py|pytest|/root/repo|train_synthetic|__graft_entry__",
                     cmd):
            suspects.append((pid, age, cmd))
    return suspects


def preflight(wait_s: int = 180) -> None:
    """Wait for lingering TPU-bound processes; kill recorded PIDs as a last
    resort (explicit PIDs from the inspection above — never pattern kills).

    Round 2's official bench death is most plausibly chip contention from
    orphaned builder processes (a documented failure mode); this makes the
    hazard loud and self-healing instead of a silent rc=1.
    """
    deadline = time.time() + wait_s
    suspects = find_tpu_suspects()
    while suspects and time.time() < deadline:
        sys.stderr.write(
            f"[bench preflight] waiting on {len(suspects)} TPU-suspect process(es): "
            + "; ".join(f"pid={p} age={a}s cmd={c[:90]}" for p, a, c in suspects[:4])
            + "\n"
        )
        time.sleep(15)
        suspects = find_tpu_suspects()
    for pid, age, cmd in suspects:
        sys.stderr.write(f"[bench preflight] killing lingering pid {pid} ({cmd[:120]})\n")
        try:
            os.kill(pid, 15)
        except OSError:
            pass
    if suspects:
        time.sleep(10)
        for pid, _, _ in find_tpu_suspects():
            try:
                os.kill(pid, 9)
            except OSError:
                pass
        time.sleep(5)


def _phase(msg: str) -> None:
    """Probe-internal phase timestamps to stderr (survive a timeout kill in
    the .err.log): the round-4 diagnosis tool for where probe time goes."""
    sys.stderr.write(f"[probe +{time.monotonic() - _T0:7.1f}s] {msg}\n")
    sys.stderr.flush()


def run_one(batch_per_chip: int, force_fail: bool = False) -> None:
    _phase("importing jax")
    import jax
    import jax.numpy as jnp
    import numpy as np

    from vangan_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    jax.config.update("jax_explain_cache_misses", True)
    _phase(f"devices: {jax.devices()}")

    from vangan_tpu.config import VanGanConfig
    from vangan_tpu.models.factory import build_discriminator, build_generator
    from vangan_tpu.parallel import jit_train_step, make_mesh, put_batch, put_replicated
    from vangan_tpu.training.step import make_step_fns

    if force_fail:
        raise RuntimeError(
            "bench --force-fail: injected failure to validate traceback capture"
        )

    n_devices = len(jax.devices())
    # batch >= 2 defaults to MICROBATCH gradient accumulation (round 5): the
    # step runs per-micro at batch 1/chip — the measured-best remat-off
    # config — with device-side grad accumulation and ONE optimizer apply,
    # amortising the ~90 ms optimizer tail over the batch.
    # VANGAN_BENCH_MICRO overrides for A/B (0/1 = old split path).
    micro = int(os.environ.get(
        "VANGAN_BENCH_MICRO", str(batch_per_chip if batch_per_chip >= 2 else 1)))
    cfg = VanGanConfig(
        N_DEVICES=n_devices,
        BATCH_SIZE=batch_per_chip,
        micro_batches=max(1, micro),
        SUBVOL_PATCH_SIZE=(128, 128, 128),
        compute_dtype="bfloat16",
        # batch 3's monolithic module OOMs the remote compile helper; the
        # split step (three modules, state-identical math) compiles.
        # VANGAN_BENCH_MODE overrides for A/B — the chain fusion + flattened
        # optimizer shrink the module enough that the monolithic modes may
        # compile again at batch 3.
        backward_mode=os.environ.get(
            "VANGAN_BENCH_MODE",
            "split" if batch_per_chip >= 3 else "two_phase",
        ),
        # at batch 1 all ten network applications' activations fit in HBM:
        # skipping the per-network remat removes the backward's forward
        # recompute — measured 840 -> 623 ms (1.19 -> 1.61 patches/s/chip,
        # 2026-08-17); batch >= 2 needs the remat to fit. VANGAN_BENCH_REMAT
        # overrides for A/B. (The batch-3 fused+remat-off hypothesis was
        # chip-tested 2026-08-19 and OOMs HBM on the decoder's 48-ch concat
        # tensors — remat stays required at batch >= 2;
        # docs/BENCH_SESSION_r3.md.)
        # default remat keys off the PER-MICRO per-chip batch: each micro's
        # activations are what must fit HBM, so e.g. VANGAN_BENCH_MICRO=2
        # --batch 4 (2 patches per micro) still needs remat on.
        remat=(
            os.environ["VANGAN_BENCH_REMAT"] == "1"
            if os.environ.get("VANGAN_BENCH_REMAT") in ("0", "1")
            else (batch_per_chip // max(1, micro)) >= 2
        ),
        output_dir="/tmp/vg_bench",
        # manual arm for BASELINE config 4 (V-Net generator variant swapped
        # into the same loop): VANGAN_BENCH_GEN=vnet python bench.py --batch 1.
        # Not launched by main() — the primary metric stays the flagship
        # ResU-Net; the provenance config field records the arch.
        **({"gen_i2s": os.environ["VANGAN_BENCH_GEN"],
            "gen_s2i": os.environ["VANGAN_BENCH_GEN"]}
           if os.environ.get("VANGAN_BENCH_GEN") else {}),
    )
    models = {
        "gen_IS": build_generator(cfg.gen_i2s, cfg, role="i2s"),
        "gen_SI": build_generator(cfg.gen_s2i, cfg, role="s2i"),
        "disc_I": build_discriminator(cfg),
        "disc_S": build_discriminator(cfg),
    }
    fns = make_step_fns(cfg, models, steps_per_epoch=100)
    mesh = make_mesh(n_devices, cfg.mesh_axis)
    _phase("init params")
    state = put_replicated(fns.init(jax.random.PRNGKey(0)), mesh)
    rng = np.random.default_rng(0)
    gb = cfg.GLOBAL_BATCH_SIZE
    real_I = put_batch(jnp.asarray(rng.normal(size=(gb, 128, 128, 128, 1)), jnp.float32), mesh)
    real_S = put_batch(
        jnp.asarray((rng.uniform(size=(gb, 128, 128, 128, 1)) > 0.8) * 2.0 - 1.0, jnp.float32),
        mesh,
    )
    if cfg.micro_batches > 1:
        from vangan_tpu.parallel import jit_microbatch_step

        step = jit_microbatch_step(fns, mesh, cfg.micro_batches, donate=True,
                                   axis_name=cfg.mesh_axis)
    elif cfg.backward_mode == "split":
        from vangan_tpu.parallel import jit_split_step

        step = jit_split_step(fns, mesh, donate=True, axis_name=cfg.mesh_axis)
    else:
        step = jit_train_step(fns, mesh, donate=True, axis_name=cfg.mesh_axis)
    noise = jnp.asarray(0.1, jnp.float32)
    upd = jnp.asarray(True)
    key = jax.random.PRNGKey(1)
    _phase("compile + warmup (2 steps)")
    for i in range(2):  # compile + steady warmup
        state, result = step(state, real_I, real_S, key, noise, upd)
        float(result["total_IS_loss"])
        _phase(f"warmup step {i} done")
    # NOTE: block_until_ready does not synchronise on this remote TPU
    # platform; a host fetch does. The steps chain through the donated state,
    # so one final fetch bounds the whole timed sequence.
    _phase("timed steps")
    n_steps = 10
    t0 = time.perf_counter()
    for _ in range(n_steps):
        state, result = step(state, real_I, real_S, key, noise, upd)
    float(result["total_IS_loss"])
    dt = time.perf_counter() - t0
    patches_per_sec_per_chip = gb * n_steps / dt / n_devices
    _emit(
        {
            "metric": "cyclegan_128cube_train_patches_per_sec_per_chip",
            "value": round(patches_per_sec_per_chip, 4),
            "unit": "patches/s/chip",
            # the reference publishes no numbers (BASELINE.md): the divisor is
            # an engineering estimate, flagged as such
            "vs_baseline": round(patches_per_sec_per_chip / REF_PATCHES_PER_SEC_PER_CHIP, 4),
            "baseline": "estimated",
            # provenance: which probe configuration produced this number —
            # a manually-set VANGAN_BENCH_MODE/VANGAN_BENCH_REMAT override
            # must never be indistinguishable from the default config
            "config": {
                "batch_per_chip": batch_per_chip,
                "backward_mode": ("microbatch" if cfg.micro_batches > 1
                                  else cfg.backward_mode),
                "micro_batches": cfg.micro_batches,
                "remat": bool(cfg.remat),
                "generator": cfg.gen_i2s,
            },
        }
    )


def run_inference() -> None:
    """BASELINE config 3: sliding-window inference on a full ~600^3 volume
    with Gaussian overlap blending, on-device accumulation + division. Prints
    one JSON line with Mvoxels/sec (output voxels per second of wall time)."""
    _phase("importing jax")
    import jax
    import numpy as np

    from vangan_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    jax.config.update("jax_explain_cache_misses", True)
    _phase(f"devices: {jax.devices()}")

    from vangan_tpu.config import VanGanConfig
    from vangan_tpu.inference.stitcher import stitch_subvolumes
    from vangan_tpu.models.factory import build_generator

    cfg = VanGanConfig(N_DEVICES=1, BATCH_SIZE=1, SUBVOL_PATCH_SIZE=(128, 128, 128),
                       output_dir="/tmp/vg_bench")
    model = build_generator(cfg.gen_i2s, cfg, role="i2s")
    rng = np.random.default_rng(0)
    vol = rng.normal(size=(600, 600, 600, 1)).astype(np.float32)
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           np.zeros((1, 128, 128, 128, 1), np.float32), train=False)

    def apply_fn(v, x):
        return model.apply(v, x, train=False)

    # the metric is dominated by the tunnelled host link on this platform
    # (~2-20 MB/s, varies by the HOUR — memory/PERF.md round 4): measure the
    # link right now and embed it in the JSON so the recorded Mvox/s carries
    # its confounder. 16 MB probe each way, scalar-fetch synced.
    _phase("link probe")
    import jax.numpy as jnp
    probe_np = np.ones((4 * 1024 * 1024,), np.float32)
    t0 = time.perf_counter()
    probe_d = jnp.asarray(probe_np)
    float(probe_d[0])
    h2d_mbps = probe_np.nbytes / (time.perf_counter() - t0) / 1e6
    t0 = time.perf_counter()
    np.asarray(probe_d)
    d2h_mbps = probe_np.nbytes / (time.perf_counter() - t0) / 1e6
    _phase(f"link: h2d {h2d_mbps:.1f} MB/s, d2h {d2h_mbps:.1f} MB/s")

    # int8 upload (quantized on host, dequantized on device) is the
    # production config for uint8-TIFF consumers — within one grey level of
    # the float path on the output grid (tests/test_stitcher.py) at half the
    # f16 upload bytes. VANGAN_BENCH_UPLOAD overrides for A/B.
    upload_dtype = os.environ.get("VANGAN_BENCH_UPLOAD", "int8")
    kw = dict(subvol_size=(1, 128, 128, 128, 1), stride=(64, 64, 64), complete=True,
              padFactor=0.1, save=False, batch_size=cfg.stitcher_batch, blend="gaussian",
              device_apply=(apply_fn, variables),
              # the production run_mapping config: exactly-scaled uint8 band
              # streaming + on-device padding (the tunnelled host link is
              # the bottleneck — tests/test_stitcher.py)
              stream_dtype=cfg.stitcher_stream_dtype,
              upload_dtype=upload_dtype)
    # shape-correct warm-up: ONE accumulation chunk on the real volume
    # compiles every shape-keyed program the timed run uses (VERDICT r2 weak
    # #5 — a 160^3 warm-up volume warmed nothing for the 720^3 buffers)
    _phase("warm-up chunk (compiles)")
    stitch_subvolumes(None, vol, max_chunks=1, **kw)
    _phase("timed stitch")
    phases: dict = {}
    t0 = time.perf_counter()
    out = stitch_subvolumes(None, vol, timings=phases, **kw)
    dt = time.perf_counter() - t0
    mvox = out.size / dt / 1e6
    _phase(f"phases: {phases}")
    line = {
        "metric": "fullvol_600cube_gaussian_stitch_Mvoxels_per_sec",
        "value": round(mvox, 2), "unit": "Mvoxels/s",
        "vs_baseline": round(mvox / 1.0, 2),
        "baseline": "estimated",
        "config": {"upload_dtype": upload_dtype,
                   "stream_dtype": cfg.stitcher_stream_dtype},
        "link_MBps": {"h2d": round(h2d_mbps, 1), "d2h": round(d2h_mbps, 1)},
        "phases_s": {k: round(v, 1) for k, v in phases.items()},
    }
    if phases.get("compute_s"):
        # the link-independent number: voxels/s of pure device stitch time
        line["device_Mvox_per_sec"] = round(out.size / phases["compute_s"] / 1e6, 2)
    _emit(line)


def run_selftest() -> int:
    """Run the on-chip Pallas parity tests (VERDICT round-1 weak #6) so every
    bench round re-validates kernel correctness on real hardware."""
    os.makedirs(LOG_DIR, exist_ok=True)
    # no -x: a failure in any one gate class must not mask the default-path
    # parity tests that validate what the primary probes actually run —
    # report every failure instead
    proc = subprocess.run(
        [sys.executable, "-m", "pytest", "tests/test_pallas_tpu.py", "-q",
         "--no-header"],
        capture_output=True, text=True, timeout=5400, cwd=REPO,
        env={**os.environ, "JAX_PLATFORMS": "", "VANGAN_TPU_TESTS": "1"},
    )
    with open(os.path.join(LOG_DIR, "selftest.out.log"), "w") as f:
        f.write(proc.stdout)
    with open(os.path.join(LOG_DIR, "selftest.err.log"), "w") as f:
        f.write(proc.stderr)
    tail = proc.stdout.strip().splitlines()[-1] if proc.stdout.strip() else "?"
    sys.stderr.write(f"[bench selftest] rc={proc.returncode}: {tail}\n")
    return proc.returncode


def _run_probe(args: list, tag: str, timeout: int = 3600, extra_env: dict = None):
    """One subprocess probe: full logs to bench_logs/, parsed JSON line or an
    extracted traceback back to the caller. extra_env is unused by the default
    flow; it is retained for manual A/B runs (e.g. VANGAN_BENCH_MODE arms)."""
    os.makedirs(LOG_DIR, exist_ok=True)
    env = {**os.environ, "JAX_TRACEBACK_FILTERING": "off", **(extra_env or {})}
    try:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__)] + args,
            capture_output=True, text=True, timeout=timeout, cwd=REPO, env=env,
        )
        rc, out, err = proc.returncode, proc.stdout, proc.stderr
    except subprocess.TimeoutExpired as e:
        rc = -1
        out = (e.stdout or b"").decode() if isinstance(e.stdout, bytes) else (e.stdout or "")
        err = (e.stderr or b"").decode() if isinstance(e.stderr, bytes) else (e.stderr or "")
        err += f"\n[bench] probe timed out after {timeout}s"
    with open(os.path.join(LOG_DIR, f"{tag}.out.log"), "w") as f:
        f.write(out)
    with open(os.path.join(LOG_DIR, f"{tag}.err.log"), "w") as f:
        f.write(err)
    for line in out.splitlines():
        if line.startswith("{"):
            try:
                return json.loads(line), rc, None
            except json.JSONDecodeError:
                continue
    tb = extract_traceback(err or out)
    return None, rc, tb


def _probe_with_retry(args: list, tag: str, failures: list, timeout: int = 3600,
                      extra_env: dict = None, reserve: float = 0.0):
    """Run a probe; on failure, re-preflight and retry ONCE (a transient
    compile-service hiccup or contention must not zero the round).

    Each attempt's timeout is clamped to the remaining wall budget minus
    `reserve` (budget kept back for later probes); the retry is skipped when
    fewer than 240 s of unreserved budget remain.
    """
    for attempt in (1, 2):
        t = int(min(timeout, _remaining() - reserve))
        if t < 240:
            sys.stderr.write(
                f"[bench] {tag} attempt {attempt} skipped: {_remaining():.0f}s of "
                f"budget left ({reserve:.0f}s reserved)\n"
            )
            return None
        result, rc, tb = _run_probe(args, f"{tag}.a{attempt}", t, extra_env)
        if result is not None:
            return result
        sys.stderr.write(
            f"[bench] {tag} attempt {attempt} failed (rc={rc}); traceback:\n{tb}\n"
        )
        failures.append({"probe": tag, "attempt": attempt, "rc": rc, "traceback": tb})
        if attempt == 1:
            preflight(wait_s=min(60, max(0, int(_remaining() - reserve - 240))))
    return None


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--batch":
        run_one(int(sys.argv[2]))
        return
    if len(sys.argv) > 1 and sys.argv[1] == "--inference":
        run_inference()
        return
    if len(sys.argv) > 1 and sys.argv[1] == "--force-fail":
        run_one(1, force_fail=True)
        return
    if len(sys.argv) > 1 and sys.argv[1] == "--selftest":
        raise SystemExit(run_selftest())

    failures: list = []
    sys.stderr.write(f"[bench] wall budget {BUDGET_S:.0f}s (VANGAN_BENCH_BUDGET_S)\n")
    # preflight must not eat the budget when the chip is contended — cap the
    # wait so the probes still get their shot (they will fail loudly if the
    # contention is real)
    preflight(wait_s=int(min(150, max(0, _remaining() - 1200))))

    # fast-fail when the TPU backend is unreachable (the axon tunnel daemon
    # died mid-round on 2026-08-17 and jax.devices() then HANGS, not errors —
    # without this gate every probe would burn its full timeout hanging on a
    # dead backend)
    tb = None
    try:
        probe = subprocess.run(
            [sys.executable, "-c", "import jax; assert jax.devices()"],
            capture_output=True, text=True, timeout=min(240, max(60, _remaining() / 5)),
            cwd=REPO,
        )
        if probe.returncode != 0:
            tb = ("TPU backend probe failed (rc=%d) — tunnel/daemon down?\n"
                  % probe.returncode) + extract_traceback(probe.stderr)
    except subprocess.TimeoutExpired:
        tb = "TPU backend probe HUNG — tunnel/daemon down?"
    if tb is not None:
        sys.stderr.write(f"[bench] {tb}\n")
        failures.append({"probe": "backend", "rc": -1, "traceback": tb})
        _write_summary(None, None, failures)
        raise SystemExit(
            "bench aborted: TPU backend unreachable; see bench_logs/summary.json. "
            "Builder-measured session numbers are preserved in docs/BENCH_SESSION_r*.md."
        )

    dry_run = len(sys.argv) > 1 and sys.argv[1] == "--dry-run-failure"
    if dry_run:
        # prove the capture path: the injected failure must surface a REAL
        # traceback (not log noise) in stderr and summary.json
        result = _probe_with_retry(["--force-fail"], "forcefail", failures, timeout=600)
        assert result is None and failures and "force-fail" in failures[-1]["traceback"], failures
        sys.stderr.write("[bench] forced-failure dry run OK — traceback captured\n")
        _write_summary(None, None, failures)
        return

    # NOTE: the on-chip pytest selftest is intentionally NOT run here — its
    # cold-cache runtime exceeded the round-3 driver cap and zeroed the round
    # (BENCH_r03.json rc=124). `python bench.py --selftest` runs it on demand;
    # the probes below exercise every hot kernel on the real path anyway.

    # Probe plan (round-5 order, VERDICT r4 item 1): batch 3 — the
    # reference's actual per-chip training batch (main.py:71-72) — runs
    # FIRST (it was budget-starved in round 4); then batch 1 (the known
    # per-chip throughput winner, docs/BENCH_SESSION_r3.md); the inference
    # metric keeps a reserved slice.
    INFER_RESERVE = 420.0
    BATCH1_RESERVE = 380.0
    results = []
    r = _probe_with_retry(["--batch", "3"], "batch3", failures,
                          timeout=1800, reserve=INFER_RESERVE + BATCH1_RESERVE)
    if r is not None:
        results.append(r)
        _emit(r)  # probes run in captured subprocesses: the parent flushes

    r = _probe_with_retry(["--batch", "1"], "batch1", failures,
                          timeout=1800, reserve=INFER_RESERVE)
    if r is not None:
        results.append(r)
        _emit(r)

    # secondary metric (BASELINE config 3) — runs regardless of the primary
    inference = _probe_with_retry(["--inference"], "inference", failures,
                                  timeout=1200)
    if inference is not None:
        _emit(inference)

    primary = max(results, key=lambda r: r["value"]) if results else None
    if primary is not None:
        # re-print the headline as the LAST line for tail-parsing drivers
        # (each probe's line already flushed when it landed)
        _emit(primary)

    _write_summary(primary, inference, failures)
    if primary is None and inference is None:
        raise SystemExit("bench failed at every metric; see bench_logs/summary.json")


def _write_summary(primary, inference, failures) -> None:
    os.makedirs(LOG_DIR, exist_ok=True)
    with open(os.path.join(LOG_DIR, "summary.json"), "w") as f:
        json.dump({"primary": primary, "inference": inference, "failures": failures},
                  f, indent=1)
    if failures:
        sys.stderr.write(f"[bench] {len(failures)} probe failure(s) recorded in "
                         f"bench_logs/summary.json\n")


if __name__ == "__main__":
    main()
