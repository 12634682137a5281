#!/usr/bin/env python3
"""One-command bench campaign with the quiet-box stopping rule
(r11 verdict #5: the manual campaign burned 8 runs / ~3.5 h waiting
out write-path drift by hand).

Runs graft.Bench repeatedly until either
  - a sentinel-clean run's STAGE-BUILD FINGERPRINT reads the committed
    quiet profile (dedup ~11.5 s / model ~11.7 s within --slack — the
    signature README's drift-mode section identifies as "the box is
    quiet"; the sentinels alone cannot see this mode), or
  - --max-runs is exhausted.

Adoption stays with Bench's own cleanest-run-wins ledger policy
(BENCH_FULL.json is only overwritten by a clean, not-slower or
surface-changed run); this wrapper just drives the campaign, keeps
every run's artifact, and finishes with the per-query-minimum merge
over the clean runs (tools/bench_min.py — the repo's cross-round
comparison record).

Usage:
  tools/bench_campaign.py [--max-runs 8] [--sf-dir /root/testdata/sf0.1]
                          [--cpus 32] [--slack 1.35]
                          [--quiet-dedup 11.5] [--quiet-model 11.7]
                          [--keep-dir /tmp/bench_campaign]

Exit code 0 if at least one clean run landed; the summary names the
runs, their totals, stream-block sums, stage fingerprints, and whether
the quiet profile was reached.
"""
import argparse, json, os, shutil, subprocess, sys, time

STREAM_GATES = [
    "q_stream_hourly", "q_stream_recovery", "q_stream_dedup",
    "q_stream_join", "q_stream_enrich", "q_stream_sessions",
    "q_stream_cdc", "q_stream_ivm", "q_stream_sketch",
    "q_stream_balance", "q_stream_snapshots"]


def run_once(repo, sf_dir, cpus, log_path):
    env = dict(os.environ, SPARK_GRAFT_SF_DIR=sf_dir, SPARK_GRAFT_CPUS=str(cpus))
    with open(log_path, "w") as log:
        p = subprocess.run(
            [os.path.join(repo, "tools", "run_graft.sh"), "graft.Bench"],
            cwd=repo, env=env, stdout=log, stderr=subprocess.STDOUT)
    return p.returncode


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--max-runs", type=int, default=8)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--slack", type=float, default=1.35,
                    help="quiet iff stage builds <= profile * slack")
    ap.add_argument("--quiet-dedup", type=float, default=11.5)
    ap.add_argument("--quiet-model", type=float, default=11.7)
    ap.add_argument("--keep-dir", default="/tmp/bench_campaign")
    ap.add_argument("--sleep", type=float, default=0.0,
                    help="seconds to wait between runs (drift cool-down)")
    args = ap.parse_args()

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    os.makedirs(args.keep_dir, exist_ok=True)
    clean_paths, summary, quiet_hit = [], [], False

    for i in range(1, args.max_runs + 1):
        log = os.path.join(args.keep_dir, f"run{i}.log")
        print(f"[campaign] run {i}/{args.max_runs} -> {log}", flush=True)
        rc = run_once(repo, args.sf_dir, args.cpus, log)
        last = os.path.join(repo, "BENCH_LAST.json")
        if rc != 0 or not os.path.exists(last):
            summary.append((i, None, "bench failed (see log)"))
            continue
        with open(last) as f:
            d = json.load(f)
        kept = os.path.join(args.keep_dir, f"run{i}.json")
        shutil.copyfile(last, kept)
        q = d.get("queries", {})
        dedup = q.get("bench_dedup_stage_build", float("inf"))
        model = q.get("bench_model_stage_build", float("inf"))
        stream = sum(q.get(k, 0.0) for k in STREAM_GATES
                     if q.get(k, -1) >= 0)
        contended = bool(d.get("contended"))
        if not contended:
            clean_paths.append(kept)
        quiet = (not contended
                 and dedup <= args.quiet_dedup * args.slack
                 and model <= args.quiet_model * args.slack)
        summary.append((i, d.get("value"),
                        f"contended={contended} dedup={dedup:.1f}s "
                        f"model={model:.1f}s stream={stream:.2f}s "
                        f"quiet={quiet}"))
        print(f"[campaign]   total={d.get('value')}s {summary[-1][2]}",
              flush=True)
        if quiet:
            quiet_hit = True
            break
        if args.sleep:
            time.sleep(args.sleep)

    print("\n[campaign] ---- summary ----")
    for i, total, note in summary:
        print(f"  run {i}: total={total} {note}")
    print(f"[campaign] quiet profile reached: {quiet_hit}; "
          f"clean runs: {len(clean_paths)}")
    if clean_paths:
        merged = os.path.join(args.keep_dir, "minima.json")
        with open(merged, "w") as out:
            subprocess.run([sys.executable,
                            os.path.join(repo, "tools", "bench_min.py")]
                           + clean_paths, stdout=out, check=True)
        with open(merged) as f:
            m = json.load(f)
        qsum = sum(v for k, v in m["queries"].items()
                   if k.startswith("q_") and v >= 0)
        ssum = sum(m["queries"].get(k, 0.0) for k in STREAM_GATES
                   if m["queries"].get(k, -1) >= 0)
        print(f"[campaign] per-query minima over {len(clean_paths)} clean "
              f"runs: {qsum:.1f}s (stream block {ssum:.2f}s) -> {merged}")
        print("[campaign] ledger adoption: see BENCH_FULL.json "
              "(cleanest-run-wins, applied by Bench itself)")
    return 0 if clean_paths else 1


if __name__ == "__main__":
    sys.exit(main())
