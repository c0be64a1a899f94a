#!/usr/bin/env python3
"""Cross-round bench-mirror diff (VERDICT r13 #5): read two
BENCH_local_r{N}.json artifacts and print the top per-query movers,
adjudicated BYTES-FIRST (the artifact's own documented discipline):
shuffle write/read and input bytes are plan properties — identical
between same-code sessions — so a wall delta with unchanged bytes is
session wobble (the measured ±10% band), while a bytes delta is a real
plan change that must match an intentional code change.

CAVEAT (r14's q93): AQE partition coalescing is runtime-adaptive, so a
stage's shuffle BYTES can move between same-code sessions when AQE
picks a different coalesced partition count (159 -> 95 KiB on q93 with
flat wall and no code change). A "BYTES MOVED" verdict therefore still
needs a matching intentional change before it's adjudicated a plan
change — bytes-with-flat-wall and no candidate commit is AQE wobble.

Usage: python3 tools/bench_delta.py BENCH_local_r13.json BENCH_local_r14.json [topN]
"""
import sys, json


def main(old_path, new_path, top_n=12):
    old = json.load(open(old_path))
    new = json.load(open(new_path))
    oq, nq = old["queries"], new["queries"]
    print(f"suite total: {old['value']:.1f} s -> {new['value']:.1f} s "
          f"(ambient {old.get('ambient_load')} -> {new.get('ambient_load')})")
    added = sorted(set(nq) - set(oq))
    removed = sorted(set(oq) - set(nq))
    if added:
        print("added:", ", ".join(f"{q} ({nq[q]['sec']:.2f}s)" for q in added))
    if removed:
        print("removed:", ", ".join(removed))
    rows = []
    for q in sorted(set(oq) & set(nq)):
        o, n = oq[q], nq[q]
        if o["sec"] <= 0 or n["sec"] <= 0:
            continue
        ratio = n["sec"] / o["sec"]
        bytes_moved = (o["shuffle_write_kib"] != n["shuffle_write_kib"]
                       or o["input_mib"] != n["input_mib"])
        rows.append((ratio, q, o, n, bytes_moved))
    rows.sort(key=lambda r: max(r[0], 1 / r[0]), reverse=True)
    print(f"{'query':<32}{'old_s':>8}{'new_s':>8}{'ratio':>7}"
          f"{'old_wKiB':>10}{'new_wKiB':>10}{'old_inMiB':>10}{'new_inMiB':>10}  verdict")
    for ratio, q, o, n, bytes_moved in rows[:top_n]:
        verdict = "BYTES MOVED — real plan change" if bytes_moved else \
            ("wobble band" if 0.7 <= ratio <= 1.4 else "wall-only mover — re-time")
        print(f"{q:<32}{o['sec']:>8.2f}{n['sec']:>8.2f}{ratio:>7.2f}"
              f"{o['shuffle_write_kib']:>10}{n['shuffle_write_kib']:>10}"
              f"{o['input_mib']:>10}{n['input_mib']:>10}  {verdict}")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], int(sys.argv[3]) if len(sys.argv) > 3 else 12)
