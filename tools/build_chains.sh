#!/bin/sh
# Torture-chain builder (SCALING.md rounds 8-12): chains every
# COMPOSABLE amplifier in sequence over a base corpus, in BOTH
# non-commuting tail orders (nullkeys-last vs hotkey-last — the two
# key axes rewrite the same columns, so each order is its own chain).
# limit-N stays standalone (non-composable).
#
# Usage: sh tools/build_chains.sh [BASE [PREFIX]]
#   BASE   default /root/testdata/sf0.001
#   PREFIX default chain (outputs /tmp/chain_{A,B}_<i>)
# Prints the two final corpus dirs; run
#   python tools/check_parity.py --sf <dir>
# over each.
set -e
cd "$(dirname "$0")/.."
BASE=${1:-/root/testdata/sf0.001}
PREFIX=${2:-chain}
# 13 composable amplifiers (evil-unicode is r13's 20th axis) +
# clockskew (r12) before the key tail
AXES='|--nulls|--unicode|--evil-unicode|--nulls-doc|--extremes|--timewarp|--pathdocs|--vec-extremes|--props|--datewarp|--dupids|--clockskew'
build() { # $1 = order tag, $2 = tail axes
  prev=$BASE
  i=0
  OLDIFS=$IFS; IFS='|'
  for ax in $AXES; do
    IFS=$OLDIFS
    out=/tmp/${PREFIX}_$1_$i
    rm -rf "$out"
    python tools/make_tie_corpus.py $ax --src "$prev" --out "$out" >/dev/null
    prev=$out; i=$((i+1))
    IFS='|'
  done
  IFS=$OLDIFS
  for ax in $2; do
    out=/tmp/${PREFIX}_$1_$i
    rm -rf "$out"
    python tools/make_tie_corpus.py --$ax --src "$prev" --out "$out" >/dev/null
    prev=$out; i=$((i+1))
  done
  echo "$prev"
}
A=$(build A "nullkeys hotkey")
B=$(build B "hotkey nullkeys")
echo "chainA=$A chainB=$B"
