"""Compose the r4 dedup intensity-sweep table (BENCH/BASELINE.md) from
two SCALING_ONLY_DEDUP trial JSON lines (128- and 256-perm runs).

Usage: python scripts/dedup_sweep_report.py .sweep_out/dedup_128b.jsonl \
           .sweep_out/dedup_256b.jsonl
Prints the markdown table + headline efficiencies (ratio of medians,
same estimator as scaling_bench._write_report).
"""
import json
import statistics
import sys


def leg_tputs(leg: dict) -> list[float]:
    d = leg["dedup_docs"]
    return [d * w["runs"] / w["sec"] for w in leg["dedup_windows"]]


def main() -> None:
    for path in sys.argv[1:]:
        tr = json.loads(open(path).read().strip().splitlines()[-1])
        n, n4 = tr["N"], tr["4N"]
        tn, t4 = leg_tputs(n), leg_tputs(n4)
        eff = statistics.median(t4) / statistics.median(tn) / 4
        print(f"### perms={n.get('dedup_perms')} docs={n['dedup_docs']:,} "
              f"pairs={n['dedup_pairs']:,}")
        print("| window | N tput | 4N tput | pair eff |")
        print("|---|---|---|---|")
        for k, (a, b) in enumerate(zip(tn, t4)):
            print(f"| {k} | {a:,.1f} | {b:,.1f} | {b / a / 4:.3f} |")
        print(f"median-of-medians efficiency: **{eff:.3f}** "
              f"(N median {statistics.median(tn):,.1f}, "
              f"4N median {statistics.median(t4):,.1f} docs/s)\n")


if __name__ == "__main__":
    main()
