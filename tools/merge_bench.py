#!/usr/bin/env python3
"""Merge graft.Bench artifact fragments into one artifact.

Two modes:

  merge_bench.py patch <target.json> <fragment.json> [<fragment2.json> ...]
      Replace the target's per-query rows with the fragments' rows
      (fresh-JVM isolated requeue of slope outliers: a 270-query suite
      shares one JVM's GC/JIT state, and a row measured under
      accumulated suite debt misrepresents the query). Every patched
      query name is appended to the artifact's "requeued_isolated"
      list, and "value" (the total) is recomputed — the artifact
      discloses exactly which rows were re-measured.

  merge_bench.py concat <target.json> [--expect q1,q2,...] <fragment.json> [...]
      Build the target FROM the fragments (per-query-JVM stage, e.g.
      the x100 spot-check where one shared JVM lets a single query's
      GC stall kill the context for every query after it). Rows,
      failed lists and per-query loadavg are unioned; the artifact
      records isolation="per-query-jvm". --expect lists the queries
      the stage was SUPPOSED to run: any expected query with no
      fragment row (its JVM died before writing the part file — the
      x100 loop runs '|| true') is recorded as failed with value -1,
      so a crashed query can never vanish from the merged artifact.

Fragments are whole Bench artifacts (usually SPARK_GRAFT_BENCH_ONLY
runs). Failed queries (value < 0 / in "failed") replace cleanly.
"""
import json
import sys


def load(p):
    with open(p) as f:
        return json.load(f)


def save(p, d):
    with open(p, "w") as f:
        json.dump(d, f)
        f.write("\n")


def main():
    mode, target = sys.argv[1], sys.argv[2]
    rest = sys.argv[3:]
    expect = []
    if rest and rest[0] == "--expect":
        expect = [q for q in rest[1].split(",") if q]
        rest = rest[2:]
    frags = [load(p) for p in rest]
    if mode == "patch":
        art = load(target)
        requeued = list(art.get("requeued_isolated", []))
        for fr in frags:
            for q, v in fr["queries"].items():
                art["queries"][q] = v
                # only overwrite loadavg when the fragment HAS one —
                # an absent fragment value must not null a valid row
                if q in fr.get("query_loadavg", {}):
                    art.setdefault("query_loadavg", {})[q] = \
                        fr["query_loadavg"][q]
                if q not in requeued:
                    requeued.append(q)
                # a clean requeue clears a failed mark; a failed requeue sets it
                failed = set(art.get("failed", []))
                (failed.add if (q in fr.get("failed", []) or v < 0)
                 else failed.discard)(q)
                art["failed"] = sorted(failed)
        art["requeued_isolated"] = sorted(requeued)
    elif mode == "concat":
        if not frags:
            sys.exit("concat: no fragment files exist (all per-query JVMs "
                     "died before writing artifacts)")
        art = dict(frags[0])
        art["queries"], art["failed"] = {}, []
        art["query_loadavg"] = {}
        for fr in frags:
            art["queries"].update(fr["queries"])
            art["query_loadavg"].update(fr.get("query_loadavg", {}))
            art["failed"] = sorted(set(art["failed"]) | set(fr.get("failed", [])))
        # an expected query whose JVM died before writing its part file
        # has no fragment row at all — record it failed, never drop it
        missing = [q for q in expect if q not in art["queries"]]
        for q in missing:
            art["queries"][q] = -1.0
        art["failed"] = sorted(set(art["failed"]) | set(missing))
        art["isolation"] = "per-query-jvm"
    else:
        sys.exit(f"unknown mode {mode}")
    art["value"] = sum(v for v in art["queries"].values() if v > 0)
    save(target, art)
    print(f"[merge] {mode} -> {target}: {len(art['queries'])} rows, "
          f"failed={art['failed']}, total={round(art['value'], 1)}s")


if __name__ == "__main__":
    main()
