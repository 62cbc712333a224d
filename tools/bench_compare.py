#!/usr/bin/env python3
"""Compare two bench result files and flag warm-vs-warm regressions.

Accepts either a raw Bench JSON line (or a log containing one) or the
driver's BENCH_r{N}.json wrapper (whose "tail" embeds the line). Box
variance here is large (±70% run-to-run), so only ratios above the
threshold on the SAME machine and SF are meaningful; compare warm pairs.

Usage: bench_compare.py OLD NEW [ratio-threshold=1.5]
Exit 1 if any query regressed by more than the threshold.
"""
import json, sys


def load(path):
    text = open(path).read()
    try:
        d = json.loads(text)
        if "queries" in d:
            return d
        text = d.get("tail", "")
    except json.JSONDecodeError:
        pass
    # scan line-by-line and json-parse whole candidate lines (a regex
    # slice silently truncates if key order changes). Bench now emits
    # small "chunk" lines plus a final "total" summary (sized to survive
    # the driver's log-tail window): merge chunk queries in order, let
    # the summary supply value/failed and override its top-slowest
    # entries. A lone full line (e.g. bench_full.json) still works.
    merged, artifacts, summary, load = {}, {}, None, None
    for line in text.splitlines():
        line = line.strip()
        for prefix in ("[info]", "[warn]"):
            if line.startswith(prefix):
                line = line[len(prefix):].strip()
        if not line.startswith("{"):
            continue
        try:
            d = json.loads(line)
        except json.JSONDecodeError:
            continue
        if "metric" not in d:
            continue
        if d["metric"] == "artifacts":
            # shared-artifact build costs: their own line since r6
            artifacts.update(d.get("artifacts", {}))
            if "load" in d:
                load = d["load"]
            continue
        if "queries" not in d:
            continue
        if d["metric"] == "chunk":
            merged.update(d["queries"])
        else:
            # a fresh summary means a fresh run in the same log: reset
            # chunk state so warm re-runs win, as before
            summary = d
            merged.update(d["queries"])
    if summary is None:
        if merged:
            return {"metric": "total", "value": sum(merged.values()),
                    "queries": merged}
        # last resort for head-truncated captures (the r2/r3 driver
        # wrappers): recover raw "name":float pairs from the fragment
        import re
        pairs = {k: float(v) for k, v in
                 re.findall(r'"([a-z][a-z0-9_]{3,})":([0-9]+\.[0-9]+)', text)
                 if k not in ("value",)}
        if pairs:
            print(f"note: {path} had no parseable line; "
                  f"recovered {len(pairs)} query timings from a fragment")
            return {"metric": "total", "value": sum(pairs.values()),
                    "queries": pairs}
        raise SystemExit(f"no bench JSON line found in {path}")
    summary = dict(summary)
    summary["queries"] = merged
    if artifacts and "artifacts" not in summary:
        summary["artifacts"] = artifacts
    if load is not None and "load" not in summary:
        summary["load"] = load
    return summary


def load1(d):
    """Representative 1-min load for a run: max of start/end (a spike at
    either edge is enough to distrust the middle). None pre-r7, and the
    JMX fallback's -1.0 "unavailable" sentinel is not a measurement."""
    ld = d.get("load")
    if not ld:
        return None
    vals = [v[0] for v in (ld.get("start"), ld.get("end")) if v and v[0] >= 0]
    return max(vals) if vals else None


def flat(d):
    """Queries plus artifact build lines (prefixed so the diff labels
    them) — a regression in a shared generator shows on its artifact
    line, pre-r6 files simply have no such lines."""
    out = dict(d["queries"])
    for k, v in d.get("artifacts", {}).items():
        out["artifact:" + k] = v
    return out


def main():
    old, new = load(sys.argv[1]), load(sys.argv[2])
    thr = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
    oq, nq = flat(old), flat(new)
    # r6's driver bench showed 4x phantom regressions under box load:
    # when the two runs' recorded load averages differ >2x, every diff is
    # suspect and each slow line is tagged, not trusted.
    ol1, nl1 = load1(old), load1(new)
    load_skew = (ol1 is not None and nl1 is not None
                 and max(ol1, nl1) > 2 * max(min(ol1, nl1), 0.5))
    regressed = []
    print(f"total: {old['value']:.1f}s -> {new['value']:.1f}s "
          f"({len(oq)} -> {len(nq)} queries)")
    if ol1 is not None or nl1 is not None:
        def fmt_l(v):
            return "n/a" if v is None else f"{v:.1f}"
        note = "  ** LOAD SKEW: timing diffs unreliable **" if load_skew else ""
        print(f"load (1-min, max of start/end): {fmt_l(ol1)} -> {fmt_l(nl1)}{note}")
    tag = " [load-skewed]" if load_skew else ""
    for name in sorted(set(oq) | set(nq)):
        if name not in oq:
            print(f"  NEW      {name}: {nq[name]:.2f}s")
        elif name not in nq:
            print(f"  REMOVED  {name}: was {oq[name]:.2f}s")
        else:
            ratio = nq[name] / max(oq[name], 1e-9)
            if ratio > thr:
                regressed.append(name)
                print(f"  REGRESS  {name}: {oq[name]:.2f}s -> {nq[name]:.2f}s ({ratio:.1f}x){tag}")
            elif ratio < 1 / thr:
                print(f"  faster   {name}: {oq[name]:.2f}s -> {nq[name]:.2f}s ({ratio:.1f}x){tag}")
    if regressed:
        print(f"REGRESSIONS: {', '.join(regressed)}"
              + (" — load skew detected; re-measure before acting" if load_skew else ""))
        sys.exit(1)
    print("no regressions above threshold")


if __name__ == "__main__":
    main()
