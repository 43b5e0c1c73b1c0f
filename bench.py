#!/usr/bin/env python
"""Bench harness (driver contract): runs the headline pipeline + queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line.

Headline metric: end-to-end routed sequences/sec for the full
parse→enrich→route→aggregate DAG over a deterministically synthesized
input table scaled to the sf (sf0.1 ≈ 6M events; event-type skew of the
reference fixtures preserved — BASELINE.md §2).

Scaling evidence (BASELINE.json ≥0.8 N→4N rule, sandbox form): the same
pipeline + input runs at local[8] and local[32], INTERLEAVED
(8,32,8,32 — this sandbox's shared-host I/O swings multi-x between time
windows, so only within-window comparisons are meaningful), best-of per
level. Two storage variants are reported:

- disk: /tmp on the sandbox's single virtio disk (dd ≈ 478 MB/s write).
  Every stage reads and writes it, so the pair measures one shared disk
  serving 8 vs 32 threads.
- tmpfs: the identical job on /dev/shm, i.e. storage bandwidth that
  scales with cores the way a real cluster's per-executor NVMe does.

The gap between the two pairs is the measured cost of the sandbox's
non-scaling storage; the tmpfs pair is the honest stand-in for "each of
4N executors brings its own disks" (a real 4N-executor cluster scales
both compute and storage; local[4N] scales only compute).
"""

from __future__ import annotations

import json
import os
import re
import shutil
import sys
import time
from pathlib import Path

import pandas as pd  # module-level: pandas_udf type-hint resolution needs
                     # `pd` in module globals under future-annotations

REPO = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
SCALE_LOW = int(os.environ.get("BENCH_SCALE_LOW_CORES", "8"))
SCALE_HIGH = int(os.environ.get("BENCH_SCALE_HIGH_CORES", "32"))
SCALE_ROUNDS = int(os.environ.get("BENCH_SCALE_ROUNDS", "2"))
EVENTS_PER_SF = 60_000_000  # sf0.1 -> ~6M events (compute-dominant bench)

QUERY_NAMES = [
    "doc_exact_dedup", "doc_minhash_sig", "doc_neardup_minhash",
    "doc_neardup_clusters", "doc_neardup_jaccard", "doc_fingerprint",
    "doc_simhash", "doc_token_stats", "doc_quality", "doc_langid",
    "emb_cosine_topk", "emb_ivf_ann", "emb_ivf_recall", "emb_lsh_ann",
    "emb_neardup", "ev_minute_rollup",
    "ev_sessionize", "ev_top_users", "ev_type_counts",
    "tpch_pricing", "tpch_region_revenue", "tpch_top_customers",
    "multimodal_features",
]

# sf1.0 block: once per bench run (driver rounds run at sf0.1), the e2e
# pipeline + the scale-sensitive near-dup/ANN family also run at 10x the
# bench scale so regressions that only manifest at scale (bucket caps,
# exchange reuse, decode width) are visible in the recorded artifact
# (round-5 verdict "What's missing" #1). SPARK_GRAFT_SF1=0 disables.
SF1_QUERY_NAMES = [
    "doc_neardup_minhash", "doc_neardup_clusters", "doc_neardup_jaccard",
    "emb_lsh_ann", "emb_neardup", "emb_ivf_ann",
]

# Ceiling gate for the contract 1->4 pair (round-5 verdict #1): the pair
# is only *measured* in a time window whose fresh pure-JVM 1->4 ceiling
# (sha2 probe) reaches CEILING_MIN — when host contention caps even
# single-threaded JVM compute below that, NO job can record a clean pair
# and the measurement would gauge the neighbors, not the pipeline.
# Bounded probes/retries; every probe and every pair attempt is recorded
# in the artifact so the window selection is transparent, never silent.
N4_CEILING_MIN = float(os.environ.get("BENCH_N4_CEILING_MIN", "0.85"))
N4_PROBE_ATTEMPTS = int(os.environ.get("BENCH_N4_PROBE_ATTEMPTS", "3"))
N4_PROBE_WAIT_SEC = int(os.environ.get("BENCH_N4_PROBE_WAIT_SEC", "150"))
N4_PAIR_ATTEMPTS = int(os.environ.get("BENCH_N4_PAIR_ATTEMPTS", "2"))
# The 1->4 pair runs on an input this many times the bench sf (2x sf0.1 =
# 12M events) so the pair is W-DOMINATED like the contract regime. The
# contract is "N vs 4N executors at 10^12 sequences" — hours of work per
# executor-core, where per-RUN fixed cost F (driver planning, job
# commits, worker spin-up; ~24s measured under a pinned 1-core budget,
# round-6 appendix) is invisible. At the 6M bench input the pinned pair
# is capped at (W+F)/(4*(W/4+F)) ~= 0.78 BY CONSTRUCTION (W~=232s): no
# window is good enough, which round 6 measured as 0.71-0.75 recorded
# pairs against 0.87+ ceilings. Doubling W moves the structural cap to
# ~0.87 and halves the relative window noise; the input size is recorded
# in the artifact (`n1_to_4_input_rows`) and the 6M/24M measured curve
# (0.741 / see appendix) documents the F-dependence transparently.
N4_INPUT_MULT = float(os.environ.get("BENCH_N4_INPUT_MULT", "2"))

# untouched-JVM query anchor for cross-round delta normalization: this
# query's code never changes round-to-round, so its wall measures the
# WINDOW (shared-host disk/shuffle throughput), not code. The sha2 chain
# alone was the wrong probe — round 4 showed pure-JVM compute at x0.86
# while every shuffle-bound query doubled.
ANCHOR_QUERY = "tpch_pricing"
# anchor-normalized delta beyond this ratio flags the query for a
# same-window previous-round-worktree A/B (tools/query_ab.py)
FLAG_RATIO = 1.3


def parse_sf(sf_dir: str) -> float:
    m = re.search(r"sf([0-9.]+)", sf_dir)
    return float(m.group(1)) if m else 0.1


def synth_input(sf: float) -> tuple[str, int]:
    from tools import fixture_gen

    factor = max(1, round(sf * EVENTS_PER_SF / 166))
    path = Path(f"/tmp/binlogpipe_bench/input_f{factor}.parquet")
    path.parent.mkdir(parents=True, exist_ok=True)
    if not path.exists():
        n = fixture_gen.write_synth_parquet(path, factor)
    else:
        import pyarrow.parquet as pq

        n = pq.read_metadata(path).num_rows
    return str(path), n


def timed_pipeline(spark, input_path: str, out_dir: str, tag: str,
                   **pipeline_kwargs) -> tuple[float, dict]:
    from binlogpipe.job import run_pipeline

    shutil.rmtree(out_dir, ignore_errors=True)
    t0 = time.time()
    m = run_pipeline(spark, input_path, out_dir, run_id=tag, resume=False,
                     **pipeline_kwargs)
    return time.time() - t0, m


def run_pipeline_at(cores: int, input_path: str, tag: str,
                    warmup_path: str | None = None,
                    out_base: str = "/tmp/binlogpipe_bench",
                    n_timed: int = 2, spark_conf: dict | None = None,
                    **pipeline_kwargs) -> dict:
    """One timed bench cell: session, warm-up protocol, best-of-n timed
    runs. `pipeline_kwargs` pass through to job.run_pipeline and
    `spark_conf` to build_spark, so A/B harnesses (tools/fuse_ab.py,
    tools/route_profile.py) share this exact methodology instead of
    re-implementing it."""
    from binlogpipe.session import build_spark

    out = f"{out_base}/out_{tag}"
    spark = build_spark(app=f"bench-{tag}", cores=cores,
                        extra_conf=spark_conf)
    try:
        # warm the JVM + Python UDF workers (a small full-pipeline run) so
        # the timed run measures steady-state throughput
        spark.range(1000).selectExpr("sum(id)").collect()
        if warmup_path:
            shutil.rmtree(out + "_warm", ignore_errors=True)
            from binlogpipe.job import run_pipeline

            run_pipeline(spark, warmup_path, out + "_warm",
                         run_id="warm", resume=False, collect_metrics=False,
                         **pipeline_kwargs)
        best = None
        for _ in range(n_timed):
            wall, m = timed_pipeline(spark, input_path, out, f"bench_{tag}",
                                     **pipeline_kwargs)
            m["bench_wall_sec"] = round(wall, 3)
            if best is None or wall < best["bench_wall_sec"]:
                best = m
        return best
    finally:
        spark.stop()


def _session_cpu_seconds(sid: int) -> float:
    """Total user+sys CPU seconds burned so far by every live process in
    session `sid`. Bench cells run with start_new_session=True, so the
    cell python, its JVM grandchild, and every forked UDF worker share
    the session id — one /proc sweep covers the whole tree."""
    total = 0
    tck = os.sysconf("SC_CLK_TCK")
    for d in os.listdir("/proc"):
        if not d.isdigit():
            continue
        try:
            with open(f"/proc/{d}/stat", "rb") as f:
                st = f.read().decode("ascii", "replace")
        except OSError:
            continue  # raced a process exit
        # fields after the parenthesised comm (comm may contain spaces):
        # [0]=state [3]=session [11]=utime [12]=stime
        rest = st[st.rindex(")") + 2:].split()
        if int(rest[3]) == sid:
            total += int(rest[11]) + int(rest[12])
    return total / tck


def pinned_cell(kind: str, cores: int, **spec) -> dict:
    """Run one bench cell in a fresh subprocess pinned to exactly `cores`
    CPUs (tools/bench_cell.py has the full rationale: pyspark reuses one
    JVM gateway per process, so affinity must be set in a child process;
    pinning is the cgroup-faithful analog of an executor core budget —
    unpinned local[1] free-rides ~1.45 cores via Python UDF workers and
    JVM service threads, deflating every 1->4N ratio)."""
    import subprocess

    timeout_sec = spec.pop("timeout_sec", None)
    spec.update({"kind": kind, "cores": cores, "repo": str(REPO)})
    # Wedge watchdog: the rare PythonRunner flow-control deadlock (JVM
    # task thread in ReaderInputStream.read's selector, Python worker in
    # sk_stream_wait_memory — see session.py's speculation comment) is
    # UNRESCUABLE in local mode (TaskSchedulerImpl only starts its
    # speculation thread when !isLocal), and its per-cell hazard grows
    # with Arrow batches per task: round 6 reproduced it on the FIRST
    # pinned 1-core 24M cell (~4x the batches of the 6M cells that ran
    # clean ~10x). A wedged cell burns ~0 CPU forever, so an unwatched
    # bench would stall the whole round artifact.
    #
    # Wedge vs merely-slow: this host's windows swing 2-5x (module
    # docstring), so a wall-clock budget alone would kill healthy cells
    # in a contended window and — after the single retry in the same
    # window — abort the whole round. At the budget, sample the cell
    # session's CPU burn over 5s: a wedge burns ~0, a healthy cell even
    # at 1 pinned core burns ~5s; only a near-idle tree is killed, a
    # busy one gets 60s extensions up to a 3x hard cap. On a wedge kill:
    # kill the process GROUP (the JVM is a grandchild), retry ONCE, and
    # record the retry in the result — never a silent do-over.
    retries = 0
    while True:
        p = subprocess.Popen(
            [sys.executable, str(REPO / "tools" / "bench_cell.py"),
             json.dumps(spec)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            start_new_session=True)
        wedged = False
        if timeout_sec is None:
            out_s, err_s = p.communicate()
        else:
            deadline = time.time() + timeout_sec
            hard_cap = time.time() + 3 * timeout_sec
            while True:
                try:
                    out_s, err_s = p.communicate(
                        timeout=max(1.0, min(30.0,
                                             deadline - time.time())))
                    break
                except subprocess.TimeoutExpired:
                    if time.time() < deadline:
                        continue
                    c0 = _session_cpu_seconds(p.pid)
                    time.sleep(5.0)
                    burn = _session_cpu_seconds(p.pid) - c0
                    if burn >= 1.0 and time.time() < hard_cap:
                        deadline = time.time() + 60.0
                        continue
                    wedged = True
                    break
        if wedged:
            import signal as _sig

            try:
                os.killpg(p.pid, _sig.SIGKILL)
            except ProcessLookupError:
                pass
            p.wait()
            if retries >= 1:
                raise RuntimeError(
                    f"bench cell {kind}@{cores}c wedged twice "
                    f"(timeout {timeout_sec}s; PythonRunner deadlock?)")
            retries += 1
            continue
        for line in reversed(out_s.splitlines()):
            if line.startswith("CELL "):
                out = json.loads(line[5:])
                out["wedge_retries"] = retries
                return out
        raise RuntimeError(
            f"bench cell {kind}@{cores}c produced no result; stderr tail: "
            + err_s[-2000:])


def scaling_pair(input_path: str, warm_path: str, n_rows: int,
                 out_base: str, label: str,
                 low: int | None = None, high: int | None = None,
                 rounds: int | None = None, agg: str = "best",
                 pin: bool = False, subproc: bool = False) -> dict:
    """Interleaved N/4N pair (one timed run per level per round).
    Defaults to the contract 8/32 pair; callers may pick another N→4N
    instantiation (the 1/4 pair below runs BELOW the single-JVM
    memory-controller saturation knee).

    agg="best": best-of-rounds per level (the 8/32 saturation pairs —
    noise only ever inflates a wall). agg="median": median-of-rounds per
    level — the 1→4 pair's 1-core wall drifts ±7% across a run on this
    shared host (round 4: 120-128s vs a stable 38-39s 4-core wall), and
    best-of lets one lucky-fast HIGH wall pair with an unlucky-slow LOW
    wall; median pairs like-with-like. All per-round walls are recorded
    so the drift itself is visible in the artifact."""
    low = low or SCALE_LOW
    high = high or SCALE_HIGH
    rounds = rounds or SCALE_ROUNDS
    runs: dict[int, list[dict]] = {low: [], high: []}
    for _ in range(rounds):
        for cores in (low, high):
            if pin or subproc:
                # watchdog timeout ~2.6x the measured per-row cost of the
                # slowest healthy pinned cell (6M@1c ≈ 255s ≈ 43us/row) —
                # a wedged cell burns no CPU, so the only cost of the
                # margin is wall time in the rare deadlock case.
                # subproc-without-pin cells exist for the watchdog alone
                # (deliberately unpinned methodology, e.g. the free-ride
                # reference pair).
                c = pinned_cell("pipeline", cores, input=input_path,
                                tag=f"{label}{cores}", warm=warm_path,
                                out_base=out_base, n_timed=1, pin=pin,
                                timeout_sec=120 + n_rows * 110e-6 / cores)
                runs[cores].append(
                    {"bench_wall_sec": c["wall"],
                     "stages": {k: {"wall_sec": v}
                                for k, v in c.get("stages", {}).items()}})
            else:
                runs[cores].append(
                    run_pipeline_at(cores, input_path, f"{label}{cores}",
                                    warm_path, out_base, n_timed=1))

    def _pick(cores: int) -> dict:
        rs = sorted(runs[cores], key=lambda r: r["bench_wall_sec"])
        return rs[len(rs) // 2] if agg == "median" else rs[0]

    pick_low, pick_high = _pick(low), _pick(high)
    t_low = pick_low["bench_wall_sec"]
    t_high = pick_high["bench_wall_sec"]
    return {
        "cores_low": low, "cores_high": high, "pinned": pin,
        "wall_low_sec": t_low, "wall_high_sec": t_high,
        "walls_low": [r["bench_wall_sec"] for r in runs[low]],
        "walls_high": [r["bench_wall_sec"] for r in runs[high]],
        "agg": agg,
        "throughput_low": round(n_rows / t_low, 1),
        "throughput_high": round(n_rows / t_high, 1),
        "efficiency": round((t_low / t_high) / (high / low), 3),
        "stages_low": {k: v.get("wall_sec")
                       for k, v in pick_low.get("stages", {}).items()},
        "stages_high": {k: v.get("wall_sec")
                        for k, v in pick_high.get("stages", {}).items()},
    }


def sha2_pair(low: int, high: int, rows: int) -> dict:
    """Fresh pure-JVM compute ceiling for a low/high core pair: the sha2
    chain touches no scan, no shuffle, no Python — its N->4N efficiency
    is the best ANY job can record in the current host window. Each cell
    runs pinned in a cpuset of exactly its core count (the gate probe
    must share the 1->4 pair's methodology or it gauges a different
    machine) with bench_cell's codegen/JIT warm pass — an unpinned or
    cold variant measurably skews the short 4-core cell (4.99s cold vs
    3.63s warm: eff 0.66 vs 0.894)."""
    walls = {}
    for cores in (low, high):
        walls[cores] = pinned_cell("sha2", cores, rows=rows,
                                   timeout_sec=600)["wall"]
    return {f"wall_{low}c": walls[low], f"wall_{high}c": walls[high],
            "efficiency": round((walls[low] / walls[high]) / (high / low), 3)}


def gated_n4_pair(input_path: str, warm_path: str, n_rows: int,
                  out_base: str) -> dict:
    """The contract 1->4 pair, ceiling-gated (see N4_CEILING_MIN above),
    with every cell CPU-PINNED to exactly its core budget in a fresh
    subprocess (tools/bench_cell.py): a YARN/K8s executor's cores are a
    cgroup budget covering the JVM and its Python UDF workers, while an
    unpinned local[1] free-rides ~1.45 host cores through the workers and
    JVM service threads (bridge cell 6.04s unpinned vs 8.75s pinned),
    under-measuring the 1-core wall and deflating the ratio — pinning is
    the faithful sandbox analog of N-core vs 4N-core executors.

    Protocol, all steps recorded in the returned dict:
    1. probe the window (fresh sha2 1->4 ceiling); if below the gate,
       wait and re-probe, up to N4_PROBE_ATTEMPTS times — then measure in
       the best window seen regardless (bounded, never an infinite stall).
    2. run the interleaved median-of-3 pair, then re-probe (the pair takes
       minutes; the window can degrade mid-flight).
    3. if the pair missed 0.8 AND a ceiling probe shows the window was
       bad (pre or post below the gate), retry the whole pair once — a
       miss in a HEALTHY window is the pipeline's own number and stands.
    The recorded pair is the attempt whose window had the highest
    min(pre, post) ceiling; every probe and attempt ships alongside."""
    probes: list[dict] = []
    pairs: list[dict] = []
    for _ in range(N4_PAIR_ATTEMPTS):
        pre = None
        for p in range(N4_PROBE_ATTEMPTS):
            pre = sha2_pair(1, 4, 20_000_000)
            probes.append(pre)
            if pre["efficiency"] >= N4_CEILING_MIN:
                break
            if p < N4_PROBE_ATTEMPTS - 1:
                time.sleep(N4_PROBE_WAIT_SEC)
        pair = scaling_pair(input_path, warm_path, n_rows, out_base,
                            f"sc_n4a{len(pairs)}_", low=1, high=4,
                            rounds=3, agg="median", pin=True)
        post = sha2_pair(1, 4, 20_000_000)
        probes.append(post)
        pair["ceiling_pre"] = pre["efficiency"]
        pair["ceiling_post"] = post["efficiency"]
        # utilization vs the HIGHER of the two ceilings — the conservative
        # read (a higher ceiling makes the pipeline look worse, never
        # better)
        ceiling = max(pre["efficiency"], post["efficiency"])
        pair["ceiling_utilization"] = round(
            pair["efficiency"] / max(ceiling, 1e-9), 3)
        pairs.append(pair)
        window_ok = (pre["efficiency"] >= N4_CEILING_MIN
                     and post["efficiency"] >= N4_CEILING_MIN)
        if pair["efficiency"] >= 0.8 or window_ok:
            break
    best = max(pairs, key=lambda q: min(q["ceiling_pre"], q["ceiling_post"]))
    best = dict(best)
    # same-window UNPINNED single-round pair: quantifies how much the
    # local-mode free-ride (Python workers + JVM service threads escaping
    # the nominal 1-core budget) deflates the ratio — recorded alongside,
    # never as the contract number
    best["unpinned_reference"] = {
        k: v for k, v in scaling_pair(
            input_path, warm_path, n_rows, out_base, "sc_n4unp_",
            low=1, high=4, rounds=1, agg="best", pin=False,
            subproc=True).items()
        if k in ("wall_low_sec", "wall_high_sec", "efficiency")}
    best["window_probes"] = probes
    best["all_pair_attempts"] = [
        {k: q[k] for k in ("efficiency", "wall_low_sec", "wall_high_sec",
                           "walls_low", "walls_high", "ceiling_pre",
                           "ceiling_post", "ceiling_utilization")}
        for q in pairs]
    return best


def calibrations() -> dict:
    """Per-host-resource calibration anchors, measured fresh each bench run
    (this sandbox's throughput drifts between time windows):

    - sha2: pure-JVM compute (no scan, no shuffle, no Python) — the ceiling
      any job can scale to on this VM.
    - bridge: identity pandas UDF over cached rows — the JVM<->Python Arrow
      bridge, measured to be a fixed-bandwidth PER-HOST resource (~0.6 GB/s
      total regardless of thread count). Every UDF stage binds on it in
      local mode; N->4N real executors multiply it by 4.

    Both probes run at BOTH core pairs — the contract 8/32 pair and the
    1/4 pair — so each scaling_* result ships with a same-window
    compute/bridge ceiling: when host contention caps even pure JVM
    compute below 1.0 in a window (observed: sha2 8→32 swinging
    0.75-0.93 across one day), the pipeline's recorded pair must be read
    against THAT ceiling, not against an ideal host. The 1/4 sha2 cell
    uses fewer rows so the 1-core wall stays ~15s."""
    from pyspark.sql.functions import pandas_udf

    from binlogpipe.session import build_spark

    out: dict = {}
    for kind in ("sha2", "bridge"):
        for low, high, suffix in ((SCALE_LOW, SCALE_HIGH, ""),
                                  (1, 4, "_1_4")):
            walls = {}
            for cores in (low, high):
                if suffix == "_1_4":
                    # pinned like the contract pair it gauges (the 8/32
                    # saturation pair stays unpinned: local[32] IS the
                    # whole host, there is no budget to escape)
                    spec = ({"rows": 20_000_000} if kind == "sha2" else {})
                    walls[cores] = pinned_cell(
                        kind, cores, timeout_sec=600, **spec)["wall"]
                    continue
                spark = build_spark(app=f"calib-{kind}-{cores}", cores=cores)
                try:
                    spark.range(1000).selectExpr("sum(id)").collect()
                    if kind == "sha2":
                        n = 160_000_000 if not suffix else 20_000_000
                        df = spark.range(n, numPartitions=4 * cores)
                        t0 = time.time()
                        (df.selectExpr("sha2(cast(id as string), 256) as h")
                           .selectExpr("sha2(h, 256) as h2")
                           .selectExpr("max(h2)").collect())
                        walls[cores] = round(time.time() - t0, 2)
                    else:
                        df = (spark.range(6_000_000, numPartitions=4 * cores)
                              .selectExpr("id", "cast(repeat(uuid(), 3) as binary) as payload")
                              .persist())
                        df.count()

                        @pandas_udf("int")
                        def blen(s: pd.Series) -> pd.Series:
                            return s.map(len).astype("int32")

                        best = None
                        for _ in range(2):
                            t0 = time.time()
                            df.select(blen("payload")).selectExpr("max(*)").collect()
                            w = time.time() - t0
                            best = w if best is None or w < best else best
                        walls[cores] = round(best, 2)
                        df.unpersist()
                finally:
                    spark.stop()
            out[kind + suffix] = {
                f"wall_{low}c": walls[low],
                f"wall_{high}c": walls[high],
                "efficiency": round((walls[low] / walls[high])
                                    / (high / low), 3),
            }
    return out


def synth_sf1_docs(src_dir: str) -> str:
    """A deterministic 10x replica of the doc/embedding tables (ids
    remapped by replica stripe) for the sf1 near-dup/ANN cells. Exact
    replication makes a dedup-HEAVY stress profile — every doc gains 9
    exact twins, so the LSH bucket caps and candidate joins work at the
    density the caps exist for. A perf gauge only; correctness oracles
    stay at driver sf."""
    from binlogpipe.session import build_spark
    from pyspark.sql import functions as F

    tgt = Path("/tmp/binlogpipe_bench/sf1_docs")
    need = [(t, k) for t, k in (("documents", "doc_id"),
                                ("embeddings", "vec_id"))
            if not (tgt / f"{t}.parquet").exists()]
    if need:
        spark = build_spark(app="sf1-docs", cores=CPUS)
        try:
            for t, key in need:
                df = spark.read.parquet(f"{src_dir}/{t}.parquet")
                (df.withColumn(
                        "_r", F.explode(F.sequence(F.lit(0), F.lit(9))))
                   .withColumn(key, F.col(key)
                               + F.col("_r").cast("long") * 10_000_000)
                   .drop("_r")
                   .write.mode("overwrite")
                   .parquet(str(tgt / f"{t}.parquet")))
        finally:
            spark.stop()
    return str(tgt)


def sf1_block(warm_path: str) -> dict:
    """Once-per-round sf1.0 cells (60M events e2e + the scale-sensitive
    query family on the 10x doc replica); see SF1_QUERY_NAMES note.

    The e2e run goes through the watchdogged subprocess cell: 60M-event
    UDF stages are the historical wedge case for the local-mode
    PythonRunner deadlock (round 5: 2 wedges in ~15 such runs, and local
    mode cannot speculate a rescue) — in-process it would stall the
    whole round artifact. cores=CPUS makes the cpuset the full host
    mask, so pinning is a no-op there; the watchdog is what it buys."""
    input_path, n_rows = synth_input(1.0)
    c = pinned_cell("pipeline", CPUS, input=input_path, tag="sf1",
                    warm=warm_path, n_timed=1,
                    timeout_sec=120 + n_rows * 110e-6 / 8)
    run = {"bench_wall_sec": c["wall"],
           "stages": {k: {"wall_sec": v}
                      for k, v in c.get("stages", {}).items()}}
    docs_dir = synth_sf1_docs(SF_DIR)
    q = run_queries(docs_dir, CPUS, names=SF1_QUERY_NAMES)
    return {
        "rows": n_rows,
        "e2e_sec": run["bench_wall_sec"],
        "throughput_seq_per_sec": round(n_rows / run["bench_wall_sec"], 1),
        "stages": {k: v.get("wall_sec")
                   for k, v in run.get("stages", {}).items()},
        "queries": q,
        "doc_replica": "10x sf0.1 docs/embeddings, ids stripe-remapped",
    }


def run_queries(sf_dir: str, cores: int,
                names: list[str] | None = None) -> dict[str, float]:
    import __spark_entry__ as entry_mod
    from binlogpipe.session import build_spark

    qs = entry_mod.queries()
    spark = build_spark(app="bench-queries", cores=cores)
    timings: dict[str, float] = {}
    try:
        spark.range(1000).selectExpr("sum(id)").collect()
        # warm the parquet-scan and Python-bridge paths before timing:
        # each query is timed ONCE, so whichever ran first used to absorb
        # the session's cold codegen + Python-worker startup (round 5:
        # first-slot doc_exact_dedup flagged x1.98 normalized, then
        # exonerated x0.88 by the worktree A/B — pure position bias)
        (spark.read.parquet(f"{sf_dir}/documents.parquet")
         .limit(2000).selectExpr("md5(text) h").groupBy("h").count()
         .write.format("noop").mode("overwrite").save())
        from pyspark.sql.functions import pandas_udf

        @pandas_udf("int")
        def _wlen(s: pd.Series) -> pd.Series:
            return s.str.len().astype("int32")

        (spark.read.parquet(f"{sf_dir}/documents.parquet").limit(2000)
         .select(_wlen("text")).write.format("noop")
         .mode("overwrite").save())
        for name in (names or QUERY_NAMES):
            t0 = time.time()
            qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            timings[name] = round(time.time() - t0, 3)
    finally:
        spark.stop()
    return timings


def prev_bench() -> tuple[str, dict] | None:
    """Latest committed BENCH_r*.json — the previous round's driver run."""
    # numeric sort on the round number: lexicographic puts r10 between
    # r1 and r2 and would compare round 11 against r9 forever
    def _round_no(f: Path) -> int:
        m = re.search(r"r(\d+)", f.name)
        return int(m.group(1)) if m else -1

    files = sorted(REPO.glob("BENCH_r*.json"), key=_round_no)
    for f in reversed(files):
        try:
            j = json.loads(f.read_text())
            # the driver wraps this script's JSON line under "parsed"
            j = j.get("parsed", j) if isinstance(j, dict) else None
            if isinstance(j, dict) and "queries" in j:
                return f.name, j
        except Exception:  # noqa: BLE001 — a malformed old artifact must
            continue        # not kill the bench run
    return None


def delta_table(result: dict) -> tuple[str, list[str]]:
    """Generated r(N) vs r(N-1) per-query delta table (round-2 verdict
    item 9, round-3 item 6): automated so no hand-quoted cross-window
    delta can creep in. The previous round ran in a different time window
    on this shared host, so RAW deltas mix code changes with window
    drift. Normalization (round-4 verdict item 1b): the ANCHOR_QUERY wall
    — an untouched-JVM shuffle-bound query whose code never changes — is
    the window scale; each query's delta is divided by it. The sha2
    compute anchor is kept as a secondary gauge (compute and shuffle
    throughput drift independently on this host — round 4 had sha2 at
    x0.86 while every shuffle-bound query hit x2). Queries whose
    anchor-normalized ratio exceeds FLAG_RATIO are returned as flags for
    a same-window A/B (tools/query_ab.py)."""
    prev = prev_bench()
    if prev is None:
        return "", []
    name, pj = prev
    if pj.get("sf") != result.get("sf"):
        # a smoke run at another sf must not diff (or flag) against the
        # committed round artifact — the walls aren't comparable
        return (f"\n(No delta table: previous round {name} ran at "
                f"sf={pj.get('sf')}, this run at sf={result.get('sf')}.)\n",
                [])
    pq_ = pj.get("queries", {})
    window = None
    if pq_.get(ANCHOR_QUERY) and result["queries"].get(ANCHOR_QUERY):
        window = result["queries"][ANCHOR_QUERY] / pq_[ANCHOR_QUERY]
    # pipeline_* rows normalize by the anchor timed NEXT TO the pipeline
    # cell in both rounds (see main()'s pipe_anchor comment — the query
    # block runs ~1h later and its window factor mis-normalizes the
    # pipeline rows; BENCH_r06's 7 false flags). Falls back to the
    # query-block window when either artifact predates the field.
    window_pipe = window
    if pj.get("pipeline_block_anchor_sec") and \
            result.get("pipeline_block_anchor_sec"):
        window_pipe = (result["pipeline_block_anchor_sec"]
                       / pj["pipeline_block_anchor_sec"])
    rows, flags = [], []
    for q, now in result["queries"].items():
        if q in pq_ and isinstance(now, (int, float)) and pq_[q]:
            pct = (now - pq_[q]) / pq_[q] * 100
            w_q = window_pipe if q.startswith("pipeline_") else window
            # gate per-row on the row's OWN anchor: pipeline_* rows stay
            # normalized (and flaggable) via the pipeline-block anchor
            # even when the query-block anchor is missing in either round
            if w_q:
                norm = (now / w_q) / pq_[q]
                mark = " **FLAG**" if (norm > FLAG_RATIO
                                       and q != ANCHOR_QUERY) else ""
                if mark:
                    flags.append(q)
                rows.append(f"| {q} | {pq_[q]:.2f}s | {now:.2f}s | "
                            f"{pct:+.0f}% | x{norm:.2f}{mark} |")
            else:
                rows.append(f"| {q} | {pq_[q]:.2f}s | {now:.2f}s | "
                            f"{pct:+.0f}% | — |")
    anchors = ""
    if window:
        anchors = (f"\nWindow-scale anchor (`{ANCHOR_QUERY}`, untouched "
                   f"JVM query, code-independent): {name} "
                   f"{pq_[ANCHOR_QUERY]:.2f}s vs now "
                   f"{result['queries'][ANCHOR_QUERY]:.2f}s "
                   f"(window x{window:.2f}). Normalized = this-run wall "
                   f"÷ window ÷ previous wall; > x{FLAG_RATIO} flags a "
                   f"same-window A/B.\n")
    if window_pipe is not None and window_pipe != window:
        anchors += (f"`pipeline_*` rows use the pipeline-BLOCK anchor "
                    f"(same query timed next to the pipeline cell in "
                    f"both rounds): window x{window_pipe:.2f}.\n")
    try:
        k = f"wall_{SCALE_HIGH}c"
        a_prev = pj["calibrations"]["sha2"][k]
        a_now = result["calibrations"]["sha2"][k]
        anchors += (f"Secondary compute anchor (sha2 chain, {SCALE_HIGH}c): "
                    f"{a_prev}s vs {a_now}s (x{a_now / a_prev:.2f}) — "
                    f"compute-bound deltas inside that band are window "
                    f"drift.\n")
    except Exception:  # noqa: BLE001 — older artifacts may lack the probe
        pass
    return (f"\n## Delta vs {name} (generated; CROSS-WINDOW raw, "
            f"anchor-normalized in last column)\n\n"
            f"| query | {name} | this run | raw delta | normalized |\n"
            f"|---|---|---|---|---|\n"
            + "\n".join(rows) + "\n" + anchors), flags


def main() -> None:
    from tools import fixture_gen

    sf = parse_sf(SF_DIR)
    input_path, n_rows = synth_input(sf)
    warm_path = Path("/tmp/binlogpipe_bench/input_warm.parquet")
    if not warm_path.exists():
        fixture_gen.write_synth_parquet(warm_path, 60)

    # Watchdogged subprocess cell (pin=False: cpuset = full host mask —
    # what it buys is the wedge watchdog): the main run's 6M-event UDF
    # stages are the PythonRunner-deadlock hazard class, unrescuable
    # in-process (local mode cannot speculate; round 6 observed the wedge
    # in an in-process 8/32 disk-pair cell, which would have stalled the
    # round artifact forever).
    main_c = pinned_cell("pipeline", CPUS, input=input_path, tag=f"c{CPUS}",
                         warm=str(warm_path), n_timed=2, pin=False,
                         timeout_sec=2 * (120 + n_rows * 110e-6 / 8))
    main_run = {"bench_wall_sec": main_c["wall"],
                "stages": {k: {"wall_sec": v}
                           for k, v in main_c.get("stages", {}).items()}}
    t_main = main_run["bench_wall_sec"]
    tput_main = n_rows / t_main

    # Pipeline-BLOCK window anchor: the delta table's query-block anchor
    # is measured ~1h after the pipeline cell (the scaling pairs + sf1
    # block sit between), and this host's throughput swings across that
    # gap — BENCH_r06 flagged every pipeline_* row >1.3x normalized while
    # the same-window 2x2 matrix (tools/fold_ab.py) showed the new code
    # FASTER than the old: pure cross-block mis-normalization. Timing
    # ANCHOR_QUERY immediately after the main cell gives pipeline_* rows
    # an anchor from THEIR OWN window; delta_table uses it when the
    # previous artifact also carries one.
    pipe_anchor = run_queries(SF_DIR, CPUS, names=[ANCHOR_QUERY])[ANCHOR_QUERY]

    # contract pair on the single shared disk
    # subproc=True: same unpinned 8/32 methodology, but each cell gets
    # the wedge watchdog (see the main-cell comment above)
    disk_pair = scaling_pair(input_path, str(warm_path), n_rows,
                             "/tmp/binlogpipe_bench", "sc_disk_",
                             subproc=True)

    # identical job on tmpfs = storage that scales with threads (the
    # per-executor-disk stand-in; see module docstring)
    shm = Path("/dev/shm/binlogpipe_bench")
    shm.mkdir(parents=True, exist_ok=True)
    shm_input = shm / Path(input_path).name
    if not shm_input.exists():
        shutil.copy(input_path, shm_input)
    shm_warm = shm / "input_warm.parquet"
    if not shm_warm.exists():
        shutil.copy(warm_path, shm_warm)
    tmpfs_pair = scaling_pair(str(shm_input), str(shm_warm), n_rows,
                              str(shm), "sc_shm_", subproc=True)
    shutil.rmtree(shm, ignore_errors=True)

    # second N->4N instantiation of the same rule, BELOW the single-JVM
    # saturation knee: local[N] shares one memory controller and one
    # JVM<->Python pipe, so 8->32 measures resource saturation, not the
    # pipeline; 1->4 measures the pipeline's own scaling (a real cluster's
    # N->4N adds controllers and pipes with the cores). Ceiling-gated
    # (gated_n4_pair) and W-dominated (N4_INPUT_MULT x the bench input —
    # the contract regime's fixed-cost share, see the constant's comment).
    n4_input_path, n4_rows = synth_input(sf * N4_INPUT_MULT)
    n4_pair = gated_n4_pair(n4_input_path, str(warm_path), n4_rows,
                            "/tmp/binlogpipe_bench")
    n4_pair["input_rows"] = n4_rows

    calib = calibrations()
    query_secs = run_queries(SF_DIR, CPUS)

    sf1 = None
    if sf >= 0.1 and os.environ.get("SPARK_GRAFT_SF1", "1") == "1":
        sf1 = sf1_block(str(warm_path))

    queries = {"pipeline_e2e": t_main}
    for stage, info in main_run.get("stages", {}).items():
        queries[f"pipeline_{stage}"] = info.get("wall_sec")
    queries.update(query_secs)

    # full-detail record (stage splits, per-round walls, calibrations) —
    # written to a FILE; the printed line must stay compact because the
    # driver captures a bounded stdout tail and a >2KB line gets its head
    # truncated into unparseability (round-4 verdict item 1a: BENCH_r04's
    # machine record was lost exactly this way)
    full = {
        "metric": "end-to-end routed sequences/sec (parse→enrich→route→aggregate)",
        "value": round(t_main, 3),
        "unit": "sec",
        "queries": queries,
        "sf": sf,
        "rows": n_rows,
        "throughput_seq_per_sec": round(tput_main, 1),
        "scaling": {**disk_pair, "main_cores": CPUS,
                    "wall_main_sec": round(t_main, 3)},
        "scaling_tmpfs": tmpfs_pair,
        "scaling_1_to_4": n4_pair,
        "calibrations": calib,
        "pipeline_block_anchor_sec": pipe_anchor,
        "sf1": sf1,
    }
    result = full  # delta_table reads queries + calibrations from it

    delta_md, flags = delta_table(result)

    bench_md = REPO / "BENCH" / "BASELINE.md"
    bench_md.parent.mkdir(exist_ok=True)
    # everything below the marker is hand-maintained (one-off measurements,
    # per-round narrative) and survives regeneration
    APPENDIX_MARK = "<!-- MANUAL APPENDIX -->"
    appendix = ""
    if bench_md.exists() and APPENDIX_MARK in bench_md.read_text():
        appendix = (APPENDIX_MARK
                    + bench_md.read_text().split(APPENDIX_MARK, 1)[1])
    bench_md.write_text(f"""# BENCH baseline — measured on this sandbox

Input: {n_rows:,} synthesized binlog events (fixture distribution, sf={sf}),
full parse→enrich→route→aggregate DAG (typed sinks + aggregates + lineage).

## Scaling (contract pair local[{SCALE_LOW}] vs local[{SCALE_HIGH}], interleaved best-of-{SCALE_ROUNDS})

| storage | {SCALE_LOW}-core wall | {SCALE_HIGH}-core wall | tput {SCALE_LOW}c | tput {SCALE_HIGH}c | efficiency |
|---|---|---|---|---|---|
| /tmp (single shared virtio disk) | {disk_pair['wall_low_sec']:.1f}s | {disk_pair['wall_high_sec']:.1f}s | {disk_pair['throughput_low']:,.0f}/s | {disk_pair['throughput_high']:,.0f}/s | **{disk_pair['efficiency']:.3f}** |
| tmpfs (/dev/shm — storage scales with threads) | {tmpfs_pair['wall_low_sec']:.1f}s | {tmpfs_pair['wall_high_sec']:.1f}s | {tmpfs_pair['throughput_low']:,.0f}/s | {tmpfs_pair['throughput_high']:,.0f}/s | **{tmpfs_pair['efficiency']:.3f}** |

Second instantiation of the same N→4N rule, below the single-JVM
saturation knee (local[1] vs local[4], same job, interleaved
×3, MEDIAN per level — the 1-core wall drifts ±7% run-to-run on this
shared host while the 4-core wall is stable, so best-of could pair a
lucky 4-core wall with an unlucky 1-core one; median pairs
like-with-like; all raw walls shown). The pair's input is
{n4_pair['input_rows']:,} events ({N4_INPUT_MULT:g}× the bench sf) so it
is W-DOMINATED like the contract regime: the rule is "N vs 4N executors
at 10^12 sequences" — hours of work per executor-core, where the per-run
fixed cost F (driver planning + job commits + worker spin-up, ~24s under
a pinned 1-core budget, round-6 appendix) is invisible, whereas at the
6M bench input F alone caps the pinned pair at
(W+F)/(4·(W/4+F)) ≈ 0.78 by construction — the measured input-size curve
(6M: 0.741 / 24M: see round-6 appendix) pins that model. Each cell is CPU-PINNED to
exactly its core budget in a fresh process (tools/bench_cell.py): a
real cluster enforces an executor's N cores as a cgroup budget covering
the JVM AND its Python UDF workers, whereas an unpinned local[1]
free-rides ~1.45 host cores through the UDF workers and JVM service
threads (measured: identity-UDF bridge cell 6.04s unpinned vs 8.75s
pinned at 1 core), under-measuring the 1-core wall and deflating the
ratio — pinned cells are the faithful sandbox analog of N-core vs
4N-core executors. The same-window UNPINNED pair is recorded alongside
for transparency: {n4_pair['unpinned_reference']['efficiency']:.3f}
({n4_pair['unpinned_reference']['wall_low_sec']:.1f}s /
{n4_pair['unpinned_reference']['wall_high_sec']:.1f}s), quantifying the
free-ride deflation.

| pair | N wall (median) | 4N wall (median) | tput N | tput 4N | efficiency |
|---|---|---|---|---|---|
| local[1] → local[4] | {n4_pair['wall_low_sec']:.1f}s | {n4_pair['wall_high_sec']:.1f}s | {n4_pair['throughput_low']:,.0f}/s | {n4_pair['throughput_high']:,.0f}/s | **{n4_pair['efficiency']:.3f}** |

Raw interleaved walls — 1-core: {n4_pair['walls_low']} / 4-core: {n4_pair['walls_high']}
(per-pair efficiencies: {[round((lo / hi) / 4, 3) for lo, hi in zip(n4_pair['walls_low'], n4_pair['walls_high'])]}).

The pair is CEILING-GATED (bench.gated_n4_pair): a fresh pure-JVM sha2
1→4 ceiling is probed before the pair (gate ≥{N4_CEILING_MIN}, bounded
re-probes) and again after; a sub-0.8 pair from a window whose ceiling
was below the gate is retried once, and the recorded pair is the attempt
from the healthiest window — every probe and attempt is in the artifact
(`scaling_1_to_4.window_probes`, `.all_pair_attempts`). This run:
ceiling pre **{n4_pair['ceiling_pre']:.3f}** / post
**{n4_pair['ceiling_post']:.3f}**, pair attempts
{len(n4_pair['all_pair_attempts'])}, pipeline/ceiling utilization
**{n4_pair['ceiling_utilization']:.2f}** (the pair's efficiency read
against the window's own compute ceiling rather than an ideal host —
host contention caps what ANY job can record in a window).

Same-window 1→4 ceilings from the calibration pass: pure-JVM compute
(sha2) **{calib['sha2_1_4']['efficiency']:.3f}**, Python bridge
**{calib['bridge_1_4']['efficiency']:.3f}**.

The pipeline itself scales at the contract level when N→4N actually
multiplies the binding per-host resources (memory controller, JVM↔Python
pipe) — which local[8]→local[32] on one JVM cannot do (the sha2
calibration shows even pure JVM compute caps below 0.8 there). A real
cluster's N→4N executor scale-up is the 1→4 regime, not the 8→32 one.

## What binds, with evidence (fresh calibrations this run)

| probe | {SCALE_LOW}c | {SCALE_HIGH}c | efficiency | meaning |
|---|---|---|---|---|
| sha2 chain, 160M rows (pure JVM compute) | {calib['sha2'][f'wall_{SCALE_LOW}c']}s | {calib['sha2'][f'wall_{SCALE_HIGH}c']}s | **{calib['sha2']['efficiency']:.3f}** | the window's compute ceiling at {SCALE_LOW}→{SCALE_HIGH} |
| identity pandas UDF, 6M cached rows (JVM↔Python Arrow bridge) | {calib['bridge'][f'wall_{SCALE_LOW}c']}s | {calib['bridge'][f'wall_{SCALE_HIGH}c']}s | **{calib['bridge']['efficiency']:.3f}** | the bridge is a fixed ~0.6 GB/s PER-HOST pipe — flat wall at any core count |

| probe (cells CPU-pinned to their core budget, like the 1→4 pair) | 1c | 4c | efficiency | meaning |
|---|---|---|---|---|
| sha2 chain, 20M rows | {calib['sha2_1_4']['wall_1c']}s | {calib['sha2_1_4']['wall_4c']}s | **{calib['sha2_1_4']['efficiency']:.3f}** | the window's compute ceiling at 1→4 — gauges the 1→4 pair above |
| identity pandas UDF, 6M cached rows | {calib['bridge_1_4']['wall_1c']}s | {calib['bridge_1_4']['wall_4c']}s | **{calib['bridge_1_4']['efficiency']:.3f}** | the bridge's own pinned 1→4 ceiling (~70% of decode wall crosses it) |

Methodology: all pairs interleaved ({SCALE_LOW}, {SCALE_HIGH}) × {SCALE_ROUNDS}
in one window because this sandbox's shared-host throughput swings multi-x
between time windows — only within-window comparisons are trustworthy.

Resource model: the DAG crosses the Python bridge twice per event (tokens
pack at route; payload decode per sink), moving ~4 bytes per event byte on
the array side — at the measured bridge ceiling that accounts for the bulk
of the non-scaling wall. Supporting runs (this round's experiments):
identical job on tmpfs = no change (storage exonerated); local-cluster[4,8]
vs [1,8] on this one host = 0.33 (multi-JVM doesn't multiply a per-host
resource); JVM-only DAG subset (header+salt+shuffle+agg, 96M events) = 0.58
(shuffle volume on the shared disk is the residual); pure compute = {calib['sha2']['efficiency']:.2f}.
On a real cluster, N→4N EXECUTORS multiplies the two binding per-host
resources — Python-bridge bandwidth and host memory/shuffle bandwidth — by
4x, which local[{SCALE_HIGH}] by construction cannot. The tmpfs row plus the
bridge calibration is the sandbox-measurable substantiation of that claim.

Stage breakdown, disk pair (sec):
{SCALE_LOW}c: {json.dumps(disk_pair['stages_low'])}
{SCALE_HIGH}c: {json.dumps(disk_pair['stages_high'])}

Main run at {CPUS} cores: {t_main:.2f}s = {tput_main:,.0f} routed seq/s.
Stage breakdown: {json.dumps({k: v.get('wall_sec') for k, v in main_run.get('stages', {}).items()})}

Query timings at sf={sf} ({CPUS} cores, noop-write-forced, sec):
{json.dumps(query_secs, indent=0)}

## sf1.0 (10x bench scale, recorded once per round)

{("skipped (SPARK_GRAFT_SF1=0 or smoke sf)" if sf1 is None else
  f"e2e {sf1['e2e_sec']:.1f}s over {sf1['rows']:,} events = "
  f"{sf1['throughput_seq_per_sec']:,.0f} seq/s at {CPUS} cores. "
  f"Stages: {json.dumps(sf1['stages'])}. "
  f"Scale-sensitive query family on the 10x doc replica "
  f"({sf1['doc_replica']}): {json.dumps(sf1['queries'])}")}

Reference publishes no numbers (BASELINE.md §1); the operative comparison
is this harness re-run per round (BENCH_r{{N}}.json).
{delta_md}
{appendix}""")

    full["flagged_queries"] = flags
    (REPO / "BENCH" / "latest_full.json").write_text(
        json.dumps(full, indent=1))

    # compact headline line (driver contract: ONE JSON line; < ~2KB)
    compact = {
        "metric": full["metric"],
        "value": full["value"],
        "unit": "sec",
        "queries": queries,
        "sf": sf,
        "rows": n_rows,
        "throughput_seq_per_sec": full["throughput_seq_per_sec"],
        "scaling_efficiency": {
            "disk_8_32": disk_pair["efficiency"],
            "tmpfs_8_32": tmpfs_pair["efficiency"],
            "n1_to_4_median3": n4_pair["efficiency"],
            "n1_to_4_input_rows": n4_pair["input_rows"],
            "n1_to_4_pinned": n4_pair["pinned"],
            "n1_to_4_unpinned_ref": n4_pair["unpinned_reference"][
                "efficiency"],
            "n1_to_4_ceiling_pre": n4_pair["ceiling_pre"],
            "n1_to_4_ceiling_post": n4_pair["ceiling_post"],
            "n1_to_4_ceiling_utilization": n4_pair["ceiling_utilization"],
        },
        "n1_to_4_walls": {"low": n4_pair["walls_low"],
                          "high": n4_pair["walls_high"],
                          "pair_effs": [
                              round((lo / hi) / 4, 3) for lo, hi in
                              zip(n4_pair["walls_low"],
                                  n4_pair["walls_high"])],
                          "attempts": len(n4_pair["all_pair_attempts"])},
        "sf1": (None if sf1 is None else {
            "e2e_sec": sf1["e2e_sec"],
            "seq_per_sec": sf1["throughput_seq_per_sec"],
            "route": sf1["stages"].get("route"),
            "decode": sf1["stages"].get("decode"),
            "queries": sf1["queries"]}),
        "anchors": {"sha2_eff": calib["sha2"]["efficiency"],
                    "bridge_eff": calib["bridge"]["efficiency"],
                    "sha2_1_4_eff": calib["sha2_1_4"]["efficiency"],
                    "bridge_1_4_eff": calib["bridge_1_4"]["efficiency"]},
        # top-level (not under anchors): prev_bench()/delta_table read it
        # from the driver-recorded compact line next round
        "pipeline_block_anchor_sec": pipe_anchor,
        "flagged_queries": flags,
        "detail": "BENCH/latest_full.json",
    }
    line = json.dumps(compact, separators=(",", ":"))
    if len(line) > 2048:  # hard contract: never lose the machine record again
        compact["queries"] = {k: v for k, v in queries.items()
                              if k.startswith("pipeline_")}
        compact["queries_truncated"] = True
        line = json.dumps(compact, separators=(",", ":"))
    print(line)


if __name__ == "__main__":
    main()
