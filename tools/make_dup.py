#!/usr/bin/env python3
"""Rebuild the DUPLICATION-structure audit corpora (VERDICT r17 #1/#5).

The r17b q143 hard failure (an 11.6 GiB broadcast that was
"candidate-bounded" on the independent corpus but corpus-sized under
duplication) proved that scale claims for the pair/dedup family are
corpus-STRUCTURE-dependent: real corpora are duplication-heavy, and a
10× duplication corpus does ~100× the pair work of a 10× independent
one. This wrapper pins the audit matrix in one reproducible command —
it is `make_10x.py`'s default (duplication) documents construction at
the two audit factors, nothing more, so the corpora are bit-identical
to the scale gate's (`/tmp/sf01x10`) and to the 100× duplication rows
in BASELINE.md.

Usage: python3 tools/make_dup.py
  builds /tmp/sf01x10  (documents x10 duplication) + /tmp/sf01x10t
     and /tmp/sf01x100 (documents x100 duplication)

Driver-side tooling only (duckdb is not an engine dependency).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import make_10x  # noqa: E402  (path bootstrap above)


def main():
    # factor 10: the standing scale-gate pair (BenchScale reads these)
    make_10x.build_docs10x("/tmp/sf01x10", 10, indep=False)
    make_10x.build_temporal10x("/tmp/sf01x10t", 10)
    # factor 100: the duplication-audit corpus (documents only matter —
    # every audited query reads documents; temporal rides the builder)
    make_10x.build_docs10x("/tmp/sf01x100", 100, indep=False)
    print("built /tmp/sf01x10 (+t) and /tmp/sf01x100 — duplication structure")


if __name__ == "__main__":
    for d in ["/tmp/sf01x10", "/tmp/sf01x10t", "/tmp/sf01x100"]:
        os.makedirs(d, exist_ok=True)
    main()
