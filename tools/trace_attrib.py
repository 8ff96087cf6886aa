#!/usr/bin/env python3
"""Attribute device time in a jax.profiler trace, without double counting.

The perfetto trace nests jit spans above the per-op rows on the same device
lane; naive aggregation by name counts nested spans twice.  This tool computes
per-event SELF time per lane (span duration minus the duration of its direct
children on the same track), then aggregates by a regex-normalized op family
and, when available, joins the HLO ``op_name`` metadata for model-level
attribution (which module emitted the op).

Usage:
  python tools/trace_attrib.py /tmp/svit_trace --iters 5 [--top 40] [--by-meta]
"""

import argparse
import glob
import gzip
import json
import re
import sys
from collections import Counter, defaultdict


FAMILY_RE = [
    (re.compile(r"^(jit_|jit__)"), "JIT"),
    (re.compile(r"^copy[.\d]*"), "copy"),
    (re.compile(r"^reshape[.\d]*"), "reshape"),
    (re.compile(r"^transpose[.\d]*"), "transpose"),
    (re.compile(r"^pad[.\d]*"), "pad"),
    (re.compile(r"^slice[.\d]*"), "slice"),
    (re.compile(r"^dynamic-slice"), "dynamic-slice"),
    (re.compile(r"^concatenate[.\d]*"), "concatenate"),
    (re.compile(r"^bitcast"), "bitcast"),
    (re.compile(r"^convert[.\d]*"), "convert"),
    (re.compile(r"^broadcast[.\d]*"), "broadcast"),
    (re.compile(r"^(convolution|conv)[._\d]"), "convolution"),
    (re.compile(r"^(dot|matmul)"), "dot"),
    (re.compile(r"^reduce_window"), "reduce_window"),
    (re.compile(r"^(all_reduce|all_gather|reduce_scatter|collective)"), "collective"),
    (re.compile(r"^(attn|pool_q|pool_k|pool_v|ffn|custom)"), "pallas-custom"),
    (re.compile(r"^fusion"), "fusion.anon"),
]


def family(name: str) -> str:
    for rx, fam in FAMILY_RE:
        if rx.search(name):
            return fam
    # name like "convolution_add_fusion.7" / "pad_maximum_fusion.3"
    m = re.match(r"^([a-z_]+?)_fusion[.\d]*$", name)
    if m:
        return f"fusion.{m.group(1)}"
    return re.sub(r"[.\d]+$", "", name) or name


def load_events(trace_dir: str):
    paths = sorted(glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True))
    if not paths:
        sys.exit(f"no trace under {trace_dir}")
    with gzip.open(paths[-1]) as f:
        t = json.load(f)
    return t.get("traceEvents", [])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("trace_dir")
    ap.add_argument("--iters", type=int, default=1)
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--by-meta", action="store_true",
                    help="aggregate by HLO op_name metadata (module attribution)")
    ap.add_argument("--ops", action="store_true",
                    help="print individual heaviest ops (self time)")
    ap.add_argument("--match", default=None,
                    help="only show rows whose name matches this regex")
    args = ap.parse_args()

    evs = load_events(args.trace_dir)
    dev_pids = {
        e["pid"]
        for e in evs
        if e.get("ph") == "M"
        and e.get("name") == "process_name"
        and "TPU" in str(e.get("args", {}).get("name", ""))
    }

    # group complete events per (pid, tid) lane; skip annotation lanes
    # ("Steps" spans cover whole iterations incl. idle and would double
    # count every real op beneath them)
    tmeta = {
        (e.get("pid"), e.get("tid")): str(e.get("args", {}).get("name", ""))
        for e in evs
        if e.get("ph") == "M" and e.get("name") == "thread_name"
    }
    lanes = defaultdict(list)
    for e in evs:
        if e.get("ph") == "X" and e.get("pid") in dev_pids:
            if tmeta.get((e["pid"], e.get("tid"))) == "Steps":
                continue
            lanes[(e["pid"], e.get("tid"))].append(e)

    # self time: sort by (start, -dur); subtract direct children via a stack
    self_us = {}
    for lane, es in lanes.items():
        es.sort(key=lambda e: (e["ts"], -e.get("dur", 0)))
        stack = []  # (end, idx)
        for i, e in enumerate(es):
            ts, dur = e["ts"], e.get("dur", 0)
            while stack and stack[-1][0] <= ts:
                stack.pop()
            if stack:
                j = stack[-1][1]
                self_us[j_key(lane, j)] = self_us.get(j_key(lane, j), 0) - dur
            self_us[j_key(lane, i)] = self_us.get(j_key(lane, i), 0) + dur
            stack.append((ts + dur, i))
        # stash events for lookup
        lanes[lane] = es

    fam_agg, op_agg, meta_agg = Counter(), Counter(), Counter()
    total = 0
    for (lane, i), us in self_us.items():
        e = lanes[lane][i]
        name = e.get("name", "?")
        if name.startswith(("jit_", "jit__")):
            continue
        if args.match and not re.search(args.match, name):
            continue
        total += us
        fam_agg[family(name)] += us
        op_agg[name] += us
        meta = str(e.get("args", {}).get("name", "")) or name
        meta_agg[meta] += us

    it = args.iters
    print(f"device self-time total (non-jit): {total / it / 1000:.2f} ms/iter")
    print("\n== by family ==")
    for name, us in fam_agg.most_common(args.top):
        print(f"{us / it / 1000:9.3f} ms  {name}")
    if args.ops:
        print("\n== heaviest individual ops (self time) ==")
        for name, us in op_agg.most_common(args.top):
            print(f"{us / it / 1000:9.3f} ms  {name[:110]}")
    if args.by_meta:
        print("\n== by HLO metadata ==")
        for name, us in meta_agg.most_common(args.top):
            print(f"{us / it / 1000:9.3f} ms  {name[:140]}")


def j_key(lane, i):
    return (lane, i)


if __name__ == "__main__":
    main()
