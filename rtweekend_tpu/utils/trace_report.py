"""Device-time report from a jax.profiler trace directory.

The analysis tool behind the round-5 throughput work: aggregates the
on-device XLA op timeline by source line / HLO category / op, so the
question "is the Pallas kernel or the XLA glue hot?" has a measured
answer (it was the glue: the compaction gathers + scatter-add were 86%
of a render while the kernel was 7% — see BASELINE.md throughput row).

Works on the axon remote-TPU tunnel (the profiler traces fine there)
and on CPU. Usage:

    with jax.profiler.trace("/tmp/trace"):
        ... one profiled iteration ...
    python -m rtweekend_tpu.utils.trace_report /tmp/trace

or programmatically: `report(trace_dir)` -> dict.
"""

from __future__ import annotations

import collections
import glob
import gzip
import json
import os


def _load_events(trace_dir: str):
    paths = glob.glob(
        os.path.join(trace_dir, "plugins", "profile", "*", "*.trace.json.gz")
    )
    if not paths:
        raise FileNotFoundError(f"no trace under {trace_dir}")
    with gzip.open(sorted(paths)[-1]) as f:
        return json.load(f)["traceEvents"]


def report(trace_dir: str, top: int = 15) -> dict:
    """Aggregate device 'XLA Ops' time by source line, category, op.

    Only the op-level device timeline is counted (module spans and host
    python spans nest and would double count)."""
    ev = _load_events(trace_dir)
    pnames, tnames = {}, {}
    for e in ev:
        if e.get("ph") == "M":
            if e.get("name") == "process_name":
                pnames[e["pid"]] = e["args"].get("name", "")
            elif e.get("name") == "thread_name":
                tnames[(e["pid"], e.get("tid"))] = e["args"].get("name", "")
    devpids = {p for p, n in pnames.items() if "TPU" in n or "GPU" in n}
    ops_thread = "XLA Ops"
    by_src = collections.Counter()
    by_cat = collections.Counter()
    by_op = collections.Counter()
    total = 0.0
    for e in ev:
        if (
            e.get("ph") == "X"
            and e["pid"] in devpids
            and tnames.get((e["pid"], e.get("tid"))) == ops_thread
        ):
            a = e.get("args") or {}
            d = e.get("dur", 0) / 1e6
            total += d
            by_src[a.get("source", "?")] += d
            by_cat[a.get("hlo_category", "?")] += d
            by_op[e["name"].split(".")[0]] += d
    rnd = lambda c: {k: round(v, 4) for k, v in c.most_common(top)}
    return {
        "device_total_s": round(total, 4),
        "by_source": rnd(by_src),
        "by_hlo_category": rnd(by_cat),
        "by_op": rnd(by_op),
    }


def main(argv=None) -> int:
    import argparse

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("trace_dir")
    p.add_argument("--top", type=int, default=15)
    args = p.parse_args(argv)
    print(json.dumps(report(args.trace_dir, args.top), indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
