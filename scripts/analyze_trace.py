"""Decompose a TPU xplane trace into per-op busy time vs inter-op gaps.

Companion to scripts/trace_batch1.py (VERDICT r4 item 4). Reads the
.xplane.pb the JAX profiler wrote, finds the TPU device plane, and for
every XLA-module execution window reports:
  - module wall duration
  - sum of HLO-op durations inside the window (device busy time)
  - idle (gap) time = wall - busy, i.e. time the core spent between ops
    (sequencer/dispatch overhead, DMA waits not overlapped with compute)
  - the top ops by cumulative time, with per-op mean duration

If busy-time ≈ wall, the latency is the ops themselves (small-shape
physics: each tiny conv underutilizes the MXU but the core is never
idle). If gaps dominate, it's dispatch overhead and cross-layer fusion
would reclaim it.

Usage: python scripts/analyze_trace.py [tracedir] [--csv out.csv]
"""
import collections
import glob
import gzip
import sys


def _load_xspace(path):
    xplane_pb2 = None
    for mod in (
        "tensorflow.tsl.profiler.protobuf.xplane_pb2",  # this image's TF
        "tensorflow.core.profiler.protobuf.xplane_pb2",
        "tsl.profiler.protobuf.xplane_pb2",
    ):
        try:
            import importlib

            xplane_pb2 = importlib.import_module(mod)
            break
        except ImportError:
            continue
    if xplane_pb2 is None:
        sys.exit("no xplane proto module available (need tensorflow)")
    raw = open(path, "rb").read()
    if path.endswith(".gz"):
        raw = gzip.decompress(raw)
    space = xplane_pb2.XSpace()
    space.ParseFromString(raw)
    return space


def main():
    tracedir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/b1trace"
    paths = sorted(glob.glob(f"{tracedir}/**/*.xplane.pb", recursive=True))
    if not paths:
        sys.exit(f"no .xplane.pb under {tracedir}")
    space = _load_xspace(paths[-1])

    device_planes = [p for p in space.planes if "TPU" in p.name and "device" in p.name.lower()]
    if not device_planes:
        print("planes found:", [p.name for p in space.planes])
        sys.exit("no TPU device plane")
    for plane in device_planes:
        print(f"\n=== plane: {plane.name} ===")
        meta = plane.event_metadata
        lines = {ln.name: ln for ln in plane.lines}
        print("lines:", {ln.name: len(ln.events) for ln in plane.lines})

        # "XLA Ops" is the serialized TensorCore op stream (busy time);
        # "Async XLA Ops" spans overlap it (DMA start->done windows) and
        # must NOT be summed into busy time.
        module_line = lines.get("XLA Modules")
        op_line = lines.get("XLA Ops")
        async_line = lines.get("Async XLA Ops")
        if op_line is None:
            continue

        def windows(line):
            return sorted(
                (line.timestamp_ns * 1000 + e.offset_ps, e.duration_ps, meta[e.metadata_id].name)
                for e in line.events
            )

        ops = windows(op_line)
        mods = windows(module_line) if module_line is not None else []

        # Per-module decomposition (skip the first = still warming caches)
        if mods:
            print(f"\n{len(mods)} module executions; per-module decomposition "
                  "(skipping the first):")
            rows = []
            for start, dur, name in mods[1:]:
                end = start + dur
                busy = sum(d for s, d, _ in ops if s >= start and s + d <= end)
                n_ops = sum(1 for s, d, _ in ops if s >= start and s + d <= end)
                rows.append((dur, busy, n_ops, name))
            if rows:
                wall = sum(r[0] for r in rows) / len(rows)
                busy = sum(r[1] for r in rows) / len(rows)
                n_ops = sum(r[2] for r in rows) / len(rows)
                print(f"  mean wall {wall/1e6:.3f} us-> {wall/1e9:.4f} ms | "
                      f"busy {busy/1e9:.4f} ms ({100*busy/wall:.1f}%) | "
                      f"gaps {(wall-busy)/1e9:.4f} ms ({100*(wall-busy)/wall:.1f}%) | "
                      f"{n_ops:.0f} ops -> mean gap/op "
                      f"{(wall-busy)/n_ops/1e3:.2f} ns" if n_ops else "  (no ops)")

        # Aggregate op table across all executions (sync TensorCore stream)
        def table(events, title, limit=40):
            agg = collections.defaultdict(lambda: [0, 0])
            for _, dur, name in events:
                agg[name][0] += 1
                agg[name][1] += dur
            total = sum(v[1] for v in agg.values())
            print(f"\n{title} ({len(agg)} distinct, {total/1e9:.3f} ms total):")
            print(f"{'op':<58}{'count':>6}{'total ms':>10}{'mean us':>9}{'%':>6}")
            for name, (cnt, tot) in sorted(agg.items(), key=lambda kv: -kv[1][1])[:limit]:
                print(f"{name[:57]:<58}{cnt:>6}{tot/1e9:>10.3f}{tot/cnt/1e6:>9.2f}"
                      f"{100*tot/total:>6.1f}")
            return agg, total

        agg, total = table(ops, "top sync ops by cumulative device time")

        # Category rollup of the sync stream
        def category(name):
            body = name.split("=", 1)[1] if "=" in name else name
            for kw in ("convolution", "fusion", "copy", "all-reduce", "reshape",
                       "transpose", "reduce-window", "dynamic-slice", "slice",
                       "concatenate", "pad", "dot", "bitcast"):
                if kw in body:
                    return kw
            return "other"

        cats = collections.defaultdict(lambda: [0, 0])
        for _, dur, name in ops:
            c = category(name)
            cats[c][0] += 1
            cats[c][1] += dur
        print("\nsync-op category rollup:")
        for c, (cnt, tot) in sorted(cats.items(), key=lambda kv: -kv[1][1]):
            print(f"  {c:<16}{cnt:>7} events {tot/1e9:>9.3f} ms {100*tot/total:>6.1f}%")

        if async_line is not None and async_line.events:
            table(windows(async_line),
                  "top ASYNC spans (DMA start->done; overlap the sync stream)",
                  limit=15)

        if "--csv" in sys.argv:
            out = sys.argv[sys.argv.index("--csv") + 1]
            with open(out, "w") as f:
                f.write("op,count,total_ps\n")
                for name, (cnt, tot) in sorted(agg.items(), key=lambda kv: -kv[1][1]):
                    f.write(f"\"{name}\",{cnt},{tot}\n")
            print(f"csv -> {out}")


if __name__ == "__main__":
    main()
