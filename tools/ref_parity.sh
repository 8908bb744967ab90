#!/usr/bin/env bash
# Reference-binary parity harness: runs the PUBLISHED reference implementation
# (compiled from /root/reference, never copied into this repo) and this engine
# on IDENTICAL MatrixMarket inputs, then prints both engines' results side by
# side. Reproduces the "Reference-binary parity" table in BENCH.md.
#
# Inputs (both deterministic):
#   fix100k.mtx  the engine's own 100k-vertex preferential-attachment web
#                fixture (graft.Cli fixtureEdges), exported via mtx-dump
#   sbm50k.mtx   a seeded 20-block stochastic block model, 50k vertices
#
# Usage: tools/ref_parity.sh [workdir]   (default /tmp/refcmp)
set -euo pipefail
REF=${REF:-/root/reference}
WORK=${1:-/tmp/refcmp}
REPO="$(cd "$(dirname "$0")/.." && pwd)"
mkdir -p "$WORK"

# 1. Compile the reference as published (main.sh's flags; double weights so
#    modularity decimals are comparable).
if [[ ! -x "$WORK/refleiden" ]]; then
  cp "$REF/main.cxx" "$WORK/" && cp -r "$REF/inc" "$WORK/"
  (cd "$WORK" && g++ -DTYPE=double -DMAX_THREADS=32 -DREPEAT_METHOD=1 \
     -std=c++17 -O3 -mavx -fopenmp main.cxx -o refleiden)
fi

# 2. Deterministic fixtures.
if [[ ! -f "$WORK/fix100k.mtx" ]]; then
  (cd "$REPO" && sbt -batch \
    "runMain graft.Cli mtx-dump --fixture 100000 --mtxout $WORK/fix100k.mtx")
fi
if [[ ! -f "$WORK/sbm50k.mtx" ]]; then
# RAW-ID MTX convention (matches graft.io.Mtx.write and the reference
# binary's loader): 0-based vertex ids written verbatim, header dims =
# max id = n-1. Malformed for strict 1-based MatrixMarket consumers —
# these fixtures are only for the two raw-id readers compared here.
python3 - "$WORK/sbm50k.mtx" <<'PY'
import sys, numpy as np
rng = np.random.default_rng(7)
B, S = 20, 2500
n = B * S
intra = []
for b in range(B):
    base = b * S
    a = rng.integers(0, S, 125000); c = rng.integers(0, S, 125000)
    m = a < c
    intra.append(np.stack([base + a[m], base + c[m]], 1))
a = rng.integers(0, n, 720000); c = rng.integers(0, n, 720000)
m = (a // S) != (c // S)
inter = np.stack([np.minimum(a[m], c[m]), np.maximum(a[m], c[m])], 1)[:240000]
e = np.unique(np.vstack(intra + [inter]), axis=0)
out = np.vstack([e, e[:, ::-1]])
with open(sys.argv[1], 'w') as f:
    f.write('%%MatrixMarket matrix coordinate real general\n')
    f.write(f'{n - 1} {n - 1} {len(out)}\n')
    np.savetxt(f, np.hstack([out, np.ones((len(out), 1))]), fmt='%d %d %.1f')
PY
fi

# 3. Reference runs (prints exact, lowmem-64, lowmem-1 per graph).
for g in sbm50k fix100k; do
  echo "=== reference binary on $g ==="
  (cd "$WORK" && ./refleiden "$g.mtx" 1 1 2>/dev/null | grep modularity)
done

# 4. Engine runs (same files; --min-moved 0 = reference termination semantics).
for g in sbm50k fix100k; do
  for opts in "" "--sketch 64"; do
    echo "=== graft engine on $g $opts ==="
    (cd "$REPO" && sbt -batch \
      "runMain graft.Cli leiden --mtx $WORK/$g.mtx --min-moved 0 $opts" 2>/dev/null \
      | grep -oE '"summary":"[^"]*"')
  done
done
