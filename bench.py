"""Flagship benchmark: Indian-Pines-scale end-to-end hierarchy + level-1
t-SNE on one TPU chip.

Config mirrors the reference's comparison_pines_embed.json: 145x145x200
hyperspectral stack, NEIGH_WALKS similarity, MERGE_RW_ONLY, symmetrized +
component-connected kNN graph with k = 90 + 1, 50 walks x 10 steps with
NORMAL step weighting, pairwise random-walk similarities, TSNE
normalization, then 2000 t-SNE iterations on level 1 (the reference's
t-SNE schedule gives 1000-2000 iterations at level-1 component counts;
BASELINE.json's bar is 2000 iterations in < 10 s end-to-end).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
vs_baseline is measured against the 10 s end-to-end target from
BASELINE.json (no published reference numbers exist; BASELINE.md).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


_WATCHDOG = None


def _start_watchdog(seconds: float):
    """If the TPU tunnel wedges, device init hangs forever; emit an error
    line and exit rather than stalling the driver."""
    global _WATCHDOG
    import threading

    def fire():
        print(json.dumps({"metric": "pines_e2e", "value": -1,
                          "unit": "seconds", "vs_baseline": 0,
                          "error": f"watchdog fired after {seconds}s "
                                   "(device hang?)"}), flush=True)
        os._exit(3)

    t = threading.Timer(seconds, fire)
    t.daemon = True
    t.start()
    _WATCHDOG = t
    return t


def _preflight_device(timeout_s: float) -> bool:
    """Probe device backend init in a subprocess: a wedged TPU tunnel hangs
    make_c_api_client indefinitely, and once attempted in-process it cannot
    be cancelled.  Returns True if the backend comes up in time."""
    import subprocess
    p = subprocess.Popen(
        [sys.executable, "-c",
         "import jax; print(jax.devices()[0].platform)"],
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True)
    try:
        out, _ = p.communicate(timeout=timeout_s)
        return p.returncode == 0 and out.strip() != ""
    except subprocess.TimeoutExpired:
        # SIGTERM first: a kill -9 mid device-init has been observed to
        # wedge the accelerator tunnel server-side
        p.terminate()
        try:
            p.wait(timeout=15)
        except subprocess.TimeoutExpired:
            p.kill()
        return False
    except Exception:
        return False


def _run_pipeline():
    """Build the Pines-config hierarchy (shared by the truly-cold child and
    the main measurement passes).  Returns (computed ComputeHierarchy,
    rebuild closure)."""
    import numpy as np  # noqa: F401 — parity with main()'s imports
    from sph_tpu import (ComputeHierarchy, ComponentSim,
                         ImageHierarchySettings, ImageStack,
                         ImportanceWeighting, LevelSimilaritiesSettings,
                         NearestNeighborsSettings, NormalizationScheme,
                         RandomWalkHandling, RandomWalkReduction,
                         RandomWalkSettings, Scaler, scale)
    from sph_tpu.utils.logging import set_level
    from sph_tpu.utils.testdata import create_hyperspectral_scene

    set_level("WARNING")
    rows = int(os.environ.get("BENCH_ROWS", 145))
    cols = int(os.environ.get("BENCH_COLS", 145))
    channels = int(os.environ.get("BENCH_CHANNELS", 200))
    img = create_hyperspectral_scene(rows, cols, channels, seed=7)
    stack = ImageStack.from_array(img, name="pines_synth")
    data = scale(stack.data, Scaler.NONE)

    k = 91  # 90 + self (comparison_pines_embed.json nKnns: [90])

    def build():
        ch = ComputeHierarchy().init(
            data, rows, cols,
            ihs=ImageHierarchySettings(
                component_sim=ComponentSim.NEIGH_WALKS,
                merge_multiple=False, use_percentile=False, max_dist=0.0,
                min_num_comp=1, min_reduction=98.0, max_levels=10,
                rw_handling=RandomWalkHandling.MERGE_RW_ONLY,
                rw_reduction=(
                    RandomWalkReduction.PROPORTIONAL_COMPONENT_REDUCTION),
                norm_knn_distances=NormalizationScheme.TSNE),
            lss=LevelSimilaritiesSettings(
                component_sim=ComponentSim.NEIGH_WALKS, ks=[k],
                random_walk_pair_sims=True,
                normalize_prob_dist=NormalizationScheme.TSNE,
                compute_symmetric_prob_dist=NormalizationScheme.TSNE),
            rws=RandomWalkSettings(
                num_random_walks=50, single_walk_length=10,
                importance_weighting=ImportanceWeighting.NORMAL,
                random_seed=1),
            nns=NearestNeighborsSettings(
                num_nearest_neighbors=k, symmetric_neighbors=True,
                compute_connect_components=True,
                neighbor_connect_components=True))
        ch.compute()
        return ch

    return build(), build


def _run_tsne(pd):
    """Level-1 t-SNE with KL tracking; returns (ComputeEmbedding, emb)."""
    from sph_tpu import ComputeEmbedding, ComputeEmbeddingSettings
    emb_settings = ComputeEmbeddingSettings()
    emb_settings.tsne.num_iterations = int(
        os.environ.get("BENCH_TSNE_ITERS", 2000))
    ce = ComputeEmbedding(emb_settings)
    emb = ce.compute_tsne(pd, track_kl=True)
    return ce, emb


def _truly_cold_child():
    """Child mode: measure the FIRST-EVER compile bill — a fresh process
    with an empty compilation cache runs the hierarchy + t-SNE compile
    pass once and reports its wall clock (the cost a brand-new machine
    pays; the reference is an AOT binary with zero JIT cost, so this is
    the number to minimize).  Prints one JSON line on stdout."""
    import tempfile
    import jax
    cache = tempfile.mkdtemp(prefix="jax_sph_tc_")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.2)
    from sph_tpu.utils.compile_count import count_compiles
    t0 = time.perf_counter()
    # parallel AOT warmup from the shipped manifest (what a production
    # fresh pod would do): compiles overlap ~4.6x across threads on the
    # remote-compile path, so the serial trace-order bill collapses
    warmup_stats = None
    manifest = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "docs", "warmup_pines.json")
    if (os.path.exists(manifest)
            and os.environ.get("BENCH_NO_WARMUP") != "1"):
        from sph_tpu.utils.warmup import replay
        warmup_stats = replay(manifest, threads=int(
            os.environ.get("BENCH_WARMUP_THREADS", "12")))
    with count_compiles() as cc:
        ch, _build = _run_pipeline()
        h = ch.image_hierarchy.hierarchy
        level = min(1, h.num_levels - 1)
        pd = ch.level_similarities.get_prob_dist(level)
        _run_tsne(pd)
    wall = time.perf_counter() - t0
    import shutil
    shutil.rmtree(cache, ignore_errors=True)
    print(json.dumps({"truly_cold_s": round(wall, 3),
                      "programs": cc.total,
                      "persistent_hits": cc.persistent_hits,
                      "warmup": warmup_stats,
                      # what still compiled serially despite the manifest
                      # (coverage target for future manifests)
                      "residual_top": cc.top(12)}), flush=True)


def _measure_truly_cold(timeout_s: float):
    """Run the truly-cold child in a subprocess (a fresh process is the
    only honest way to measure first-ever compiles: the parent's in-memory
    executable cache cannot be dropped).  Returns the parsed dict or None."""
    import subprocess
    env = dict(os.environ, BENCH_STAGE="truly_cold_child",
               BENCH_RETRIED="1")
    # recording must never leak into the child: it would clobber the
    # manifest the child is about to replay (observed: truncated file ->
    # serial compiles -> 824 s) and its per-call proxy overhead pollutes
    # the measurement
    env.pop("SPH_WARMUP_RECORD", None)
    try:
        p = subprocess.run(
            [sys.executable, os.path.abspath(__file__)], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.DEVNULL,
            timeout=timeout_s, text=True)
        for line in reversed(p.stdout.strip().splitlines()):
            try:
                d = json.loads(line)
                if "truly_cold_s" in d:
                    return d
            except ValueError:
                continue
    except Exception:
        pass
    return None


def main():
    if os.environ.get("BENCH_STAGE") == "truly_cold_child":
        _truly_cold_child()
        return
    if (os.environ.get("JAX_PLATFORMS", "") != "cpu"
            and os.environ.get("BENCH_NO_PREFLIGHT") != "1"):
        if not _preflight_device(float(os.environ.get(
                "BENCH_PREFLIGHT_S", "240"))):
            # fall back to an honest CPU measurement instead of an error:
            # re-exec with the accelerator plugin disabled
            env = dict(os.environ)
            env.pop("PALLAS_AXON_POOL_IPS", None)
            env["JAX_PLATFORMS"] = "cpu"
            env["BENCH_DEVICE_TAG"] = "cpu-fallback"
            os.execve(sys.executable,
                      [sys.executable, os.path.abspath(__file__)], env)

    watchdog = _start_watchdog(float(os.environ.get("BENCH_WATCHDOG_S",
                                                    5400)))
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/jax_sph"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.2)

    import numpy as np
    from sph_tpu import (ComputeEmbedding, ComputeEmbeddingSettings,
                         ComputeHierarchy, ComponentSim,
                         ImageHierarchySettings, ImageStack,
                         ImportanceWeighting, LevelSimilaritiesSettings,
                         NearestNeighborsSettings, NormalizationScheme,
                         RandomWalkHandling, RandomWalkReduction,
                         RandomWalkSettings, Scaler, scale)
    from sph_tpu.utils.logging import set_level
    from sph_tpu.utils.testdata import create_hyperspectral_scene

    set_level("WARNING")

    # Device numerics guard: a wedged TPU tunnel has been observed to
    # produce silently wrong results; verify a known matmul before
    # trusting any measurement.
    import jax.numpy as jnp
    a = np.arange(64, dtype=np.float32).reshape(8, 8)
    got = np.asarray(jnp.dot(jnp.asarray(a), jnp.asarray(a),
                             precision=jax.lax.Precision.HIGHEST))
    want = a @ a
    if not np.allclose(got, want, rtol=1e-5):
        print(json.dumps({"metric": "pines_e2e", "value": -1,
                          "unit": "seconds", "vs_baseline": 0,
                          "error": "device numerics check failed"}))
        return

    # Pallas-kernel probe: the fused repulsion kernel auto-enables on TPU;
    # verify it against the XLA path on real hardware first and fall back
    # if it errors or disagrees (it has CI coverage in interpret mode only
    # until a healthy chip is attached).
    if (jax.default_backend() == "tpu"
            and os.environ.get("SPH_TSNE_USE_PALLAS", "auto") == "auto"):
        try:
            from sph_tpu.models.tsne import _repulsive_forces
            from sph_tpu.ops.pallas.tsne_kernels import tsne_repulsion
            yprobe = jnp.asarray(
                np.random.default_rng(0).standard_normal(
                    (256, 2)).astype(np.float32))
            rp, zp = tsne_repulsion(yprobe, jnp.int32(200), 128, 128)
            rx, zx = _repulsive_forces(yprobe, jnp.int32(200), 128)
            ok = (np.allclose(np.asarray(rp), np.asarray(rx),
                              rtol=1e-3, atol=1e-4)
                  and abs(float(zp) - float(zx)) < 1e-2 * max(float(zx), 1))
            if not ok:
                raise ValueError("pallas/XLA repulsion mismatch")
        except Exception as exc:  # noqa: BLE001 — any failure => XLA path
            print(f"# pallas probe failed ({exc}); using XLA t-SNE path",
                  file=sys.stderr)
            os.environ["SPH_TSNE_USE_PALLAS"] = "0"

    # truly-cold tier FIRST (VERDICT r4 #1: warm / disk-cache-cold /
    # truly-cold): a fresh subprocess with an empty cache pays every
    # first-ever compile.  Runs before this process touches the persistent
    # cache so the two measurements don't share executables.
    truly_cold = None
    if os.environ.get("BENCH_SKIP_TRULY_COLD") != "1":
        truly_cold = _measure_truly_cold(
            float(os.environ.get("BENCH_TRULY_COLD_TIMEOUT_S", "2400")))

    # compile pass: traces + compiles every kernel; with the persistent
    # disk cache warm this measures the DISK-COLD tier (deserialization +
    # re-trace, what a fresh process on a warmed machine pays).  The
    # measured passes below are pure execution (warm tier).
    from sph_tpu.utils.compile_count import count_compiles
    t0 = time.perf_counter()
    with count_compiles() as cc_hier:
        ch, build = _run_pipeline()
    compile_hierarchy_s = time.perf_counter() - t0

    h = ch.image_hierarchy.hierarchy
    level = min(1, h.num_levels - 1)
    pd = ch.level_similarities.get_prob_dist(level)

    tsne_iters = int(os.environ.get("BENCH_TSNE_ITERS", 2000))
    t1 = time.perf_counter()
    with count_compiles() as cc_tsne:
        ce, emb = _run_tsne(pd)
    compile_tsne_s = time.perf_counter() - t1

    # measured passes (kernels compiled); best of N — the tunneled host's
    # effective bandwidth fluctuates 2-3x between passes (docs/
    # performance.md), so a single pass mostly measures host weather.
    # BENCH_TRACE=1 captures a jax.profiler trace of the first pass.
    import contextlib
    passes = int(os.environ.get("BENCH_PASSES", "3"))
    hierarchy_s = tsne_s = float("inf")
    for p in range(max(passes, 1)):
        trace_ctx = contextlib.nullcontext()
        if os.environ.get("BENCH_TRACE") and p == 0:
            from sph_tpu.utils.profiling import trace
            trace_ctx = trace("/tmp/sph_tpu_trace")
        t2 = time.perf_counter()
        with trace_ctx:
            ch = build()
        hierarchy_s = min(hierarchy_s, time.perf_counter() - t2)
        pd = ch.level_similarities.get_prob_dist(level)
        t3 = time.perf_counter()
        ce, emb = _run_tsne(pd)
        tsne_s = min(tsne_s, time.perf_counter() - t3)
    total_s = hierarchy_s + tsne_s

    # warm-regression band (VERDICT r4 #7): the flagship warm number must
    # not creep while attention is elsewhere.  Band is generous to tunnel
    # weather (best-of-N passes already smooths most of it).
    warm_band_s = float(os.environ.get("BENCH_WARM_BAND_S", "6.5"))
    warm_within_band = bool(total_s <= warm_band_s)

    # KL quality gate, pinned to the refreshed independent anchor
    # (docs/anchors_pines.json, scripts/anchor_kl.py run with the current
    # round's code): the tracked KL must not exceed the sklearn-BH anchor
    # KL — i.e. our optimizer stays at least as good as the independent
    # Barnes-Hut run under the same similarity structure.  Tracked KL and
    # anchor kl_under_p use slightly different Z staging, so the gate
    # compares against the BH anchor (1.6886), not our own anchor value.
    kl_anchor_bh = None
    kl_ok = None
    try:
        apath = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "docs", "anchors_pines.json")
        with open(apath) as f:
            kl_anchor_bh = json.load(f)["kl_under_p_sklearn_bh"]
        if ce.last_kl is not None:
            kl_ok = bool(ce.last_kl <= kl_anchor_bh * 1.01)
    except (OSError, KeyError, ValueError):
        pass

    iters_per_s = tsne_iters / tsne_s
    result = {
        "metric": "pines_e2e_hierarchy_plus_level1_tsne2000",
        "value": round(total_s, 3),
        "unit": "seconds",
        # BASELINE.json target: < 10 s on one v5e => ratio > 1 beats it
        "vs_baseline": round(10.0 / total_s, 3),
        "detail": {
            "hierarchy_s": round(hierarchy_s, 3),
            "tsne_s": round(tsne_s, 3),
            "tsne_iters_per_s": round(iters_per_s, 1),
            "level": level,
            "level_components": int(h.num_components[level]),
            "num_levels": h.num_levels,
            "kl": None if ce.last_kl is None else round(ce.last_kl, 5),
            "kl_anchor_sklearn_bh": kl_anchor_bh,
            "kl_within_anchor": kl_ok,
            "warm_band_s": warm_band_s,
            "warm_within_band": warm_within_band,
            # disk-cold tier: compile pass of THIS process (persistent
            # cache on disk, nothing in memory)
            "compile_hierarchy_s": round(compile_hierarchy_s, 3),
            "compile_tsne_s": round(compile_tsne_s, 3),
            "disk_cold_total_s": round(
                compile_hierarchy_s + compile_tsne_s, 3),
            # legacy alias for round<=4 tooling
            "cold_total_s": round(compile_hierarchy_s + compile_tsne_s, 3),
            # truly-cold tier: fresh subprocess, empty compilation cache —
            # every program is a first-ever compile (reference bar: AOT
            # binary, zero JIT)
            "truly_cold_s": (None if truly_cold is None
                             else truly_cold.get("truly_cold_s")),
            "truly_cold_programs": (None if truly_cold is None
                                    else truly_cold.get("programs")),
            # distinct (program, shape) executables the compile pass loads
            # (persistent-cache hits included — they are shapes that exist)
            "compiled_programs_hierarchy": cc_hier.total,
            "compiled_programs_tsne": cc_tsne.total,
            "persistent_cache_hits": (cc_hier.persistent_hits
                                      + cc_tsne.persistent_hits),
            "device": str(jax.devices()[0]),
            "device_tag": os.environ.get("BENCH_DEVICE_TAG", "primary"),
        },
    }
    watchdog.cancel()
    print(json.dumps(result))


if __name__ == "__main__":
    try:
        main()
    except Exception as e:
        # A crashed/restarted tunnel worker (observed as UNAVAILABLE /
        # ResourceExhausted mid-run) poisons the in-process client; the
        # only recovery is a fresh process.  Retry once, cleanly.
        # Cancel the first attempt's watchdog first — it would otherwise
        # keep counting and could os._exit this parent mid-retry, emitting
        # a second, bogus JSON line.
        if _WATCHDOG is not None:
            _WATCHDOG.cancel()
        import traceback
        traceback.print_exc(file=sys.stderr)
        if os.environ.get("BENCH_RETRIED"):
            print(json.dumps({"metric": "pines_e2e", "value": -1,
                              "unit": "seconds", "vs_baseline": 0,
                              "error": f"{type(e).__name__}: {e}"[:400]}),
                  flush=True)
            sys.exit(1)
        print(f"# bench failed ({type(e).__name__}); retrying in a fresh "
              "process", file=sys.stderr, flush=True)
        import subprocess
        env = dict(os.environ, BENCH_RETRIED="1")
        sys.exit(subprocess.call([sys.executable,
                                  os.path.abspath(__file__)], env=env))
