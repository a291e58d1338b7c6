"""Per-stage fwd/bwd breakdown of a captured train-step profile.

The JAX profiler's chrome trace carries, per device event, the full jax op
path (``tf_op``: ``...jvp(ResNet)/...`` forward vs ``transpose(jvp(...))``
backward), the python source line, the HLO category, and modeled flops /
bytes.  This aggregates one captured step into the phase x module tables
VERDICT r2 asked for (weak #2).

Usage:
  python tools/train_attr.py <trace.json.gz> [iters]            # phase tables
  python tools/train_attr.py <trace.json.gz> [iters] roofline   # per-fusion
      bounds table: every top fusion as (ms, bytes, flops, % of byte-bound,
      % of flop-bound) against the measured platform envelope
      (tools/roofline2.py, fixed-cost-corrected: ~824 GB/s HBM,
      ~186 TFLOP/s bf16 MXU — near spec).
      A fusion near 100% of its best bound is at its roofline; one far below
      both bounds is a formulation target (VERDICT r3 #1/#2).
"""
import collections
import gzip
import json
import re
import sys


def load_events(path):
    with gzip.open(path) as f:
        tr = json.load(f)
    pid = None
    for e in tr["traceEvents"]:
        if (e.get("ph") == "M" and e.get("name") == "process_name"
                and "TPU" in e["args"].get("name", "")):
            pid = e["pid"]
            break
    return [e for e in tr["traceEvents"]
            if e.get("ph") == "X" and e.get("pid") == pid
            and "dur" in e and "args" in e]


def classify(e):
    args = e["args"]
    op = args.get("tf_op", "")
    src = args.get("source", "")
    cat = args.get("hlo_category", "")
    if not op and not src:
        return None
    phase = "bwd" if "transpose(" in op else "fwd"
    # the optimizer update and loss live outside jvp()
    if "jvp(" not in op:
        phase = "other"
    m = re.search(r"(layer\d+_\d+|stem|head|fc)", op + " " + src)
    where = m.group(1).split("_")[0] if m else "?"
    m2 = re.search(r"/root/repo/(\S+?):(\d+)", src)
    sloc = f"{m2.group(1).rsplit('/', 1)[-1]}:{m2.group(2)}" if m2 else "?"
    return phase, where, cat, sloc, op


# r4 corrected envelope (tools/roofline2.py): the r2 numbers (127 GB/s,
# 64 TFLOP/s) were poisoned by a ~30 ms fixed relay cost PER DISPATCH that
# dominates small chained microbenches (10/50/200 trivial fori_loop iters
# all total ~32 ms).  Subtracting it: 206MB-buffer elementwise moves
# 824 GB/s (spec 819), matmul-8192 runs 186 TFLOP/s (spec 197).
HBM_GBPS = 824.0
MXU_TFLOPS = 186.0


def _num(args, *keys):
    """First numeric arg whose key contains any of the given substrings."""
    for k, v in args.items():
        lk = k.lower()
        if any(s in lk for s in keys):
            try:
                return float(str(v).replace(",", "").split()[0])
            except (ValueError, IndexError):
                continue
    return 0.0


def roofline(evs, iters):
    """Per-fusion bounds table: group leaf events by instruction name, sum
    device time, read the profiler's modeled flops / bytes-accessed, and
    print each fusion's achieved fraction of its byte- and flop-bound."""
    rows = {}
    for e in evs:
        args = e["args"]
        name = e["name"]
        key = name[:72]
        r = rows.setdefault(key, dict(dur=0.0, n=0, flops=0.0, bytes=0.0,
                                      cat=args.get("hlo_category", "?"),
                                      op=""))
        r["dur"] += e["dur"]
        r["n"] += 1
        # modeled numbers are per-occurrence; sum over occurrences
        r["flops"] += _num(args, "flops")
        r["bytes"] += _num(args, "bytes accessed", "bytes_accessed")
        if not r["op"]:
            r["op"] = args.get("tf_op", "")[:60]
    total = sum(r["dur"] for r in rows.values()) / 1e3 / iters
    print(f"{len(rows)} fusions, {total:.1f} ms/iter device time; "
          f"envelope {HBM_GBPS:.0f} GB/s HBM, {MXU_TFLOPS:.0f} TFLOP/s MXU")
    hdr = (f"{'ms/it':>7} {'%step':>5} {'GB/it':>7} {'GF/it':>7} "
           f"{'%byte':>6} {'%flop':>6} {'%best':>6}  name / category")
    print(hdr)
    cum = 0.0
    for key, r in sorted(rows.items(), key=lambda kv: -kv[1]["dur"])[:40]:
        ms = r["dur"] / 1e3 / iters
        gb = r["bytes"] / 1e9 / iters
        gf = r["flops"] / 1e9 / iters
        t_byte = gb / HBM_GBPS * 1e3       # ms if byte-bound
        t_flop = gf / (MXU_TFLOPS * 1e3) * 1e3
        pb = 100.0 * t_byte / ms if ms else 0.0
        pf = 100.0 * t_flop / ms if ms else 0.0
        cum += ms
        print(f"{ms:7.3f} {100*ms/total:5.1f} {gb:7.3f} {gf:7.1f} "
              f"{pb:6.1f} {pf:6.1f} {max(pb, pf):6.1f}  "
              f"{key} [{r['cat']}] x{r['n']//iters} {r['op']}")
    print(f"(top-40 cover {cum:.1f}/{total:.1f} ms = {100*cum/total:.0f}%)")


def main():
    path = sys.argv[1]
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    evs = load_events(path)
    leaf = [e for e in evs
            if e["args"].get("hlo_category", "") not in ("while", "")
            and not e["name"].startswith(("jit_", "while"))]
    if "roofline" in sys.argv[3:]:
        roofline(leaf, iters)
        return
    tot = sum(e["dur"] for e in leaf) / 1e3 / iters
    print(f"{len(leaf)} leaf events, {tot:.1f} ms/iter device time")

    by_phase = collections.Counter()
    by_pw = collections.Counter()
    by_cat = collections.Counter()
    by_line = collections.Counter()
    by_op = collections.Counter()
    for e in leaf:
        c = classify(e)
        if c is None:
            continue
        phase, where, cat, sloc, op = c
        d = e["dur"]
        by_phase[phase] += d
        by_pw[(phase, where)] += d
        by_cat[(phase, cat)] += d
        by_line[(phase, sloc)] += d
        # drill into the two opaque buckets: name the individual HLO ops
        # (dedup by instruction name) so layout copies and the conv fusion
        # split are actionable, not just a category total
        if cat in ("data formatting", "convolution fusion"):
            by_op[(phase, cat, e["name"][:64], where)] += d

    def show(title, counter, n=100):
        print(f"---- {title} ----")
        for k, d in counter.most_common(n):
            print(f"  {str(k):42s} {d/1e3/iters:8.2f} ms/iter")

    show("phase", by_phase)
    show("phase x layer-group", by_pw)
    show("phase x hlo category", by_cat, 24)
    show("phase x source line (top 30)", by_line, 30)
    show("formatting + conv-fusion ops (top 40)", by_op, 40)


if __name__ == "__main__":
    main()
