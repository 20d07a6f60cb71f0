#!/usr/bin/env bash
# Timed encode/decode roundtrip against local WAV assets, byte-compared
# (the analog of the reference's test_all.sh). Usage:
#   scripts/roundtrip.sh [assets_dir]
# Assets default to $LAC_TEST_ASSETS or ./assets; missing dir = no-op.
set -euo pipefail
ASSETS="${1:-${LAC_TEST_ASSETS:-assets}}"
[ -d "$ASSETS" ] || { echo "no assets dir ($ASSETS); nothing to do"; exit 0; }
TMP=$(mktemp -d)
trap 'rm -rf "$TMP"' EXIT
CLI="${LAC_CLI:-python -m lac_tpu.cli}"
status=0
for wav in "$ASSETS"/*.wav; do
  [ -e "$wav" ] || continue
  name=$(basename "$wav" .wav)
  t0=$(date +%s.%N)
  $CLI encode "$wav" "$TMP/$name.lac"
  t1=$(date +%s.%N)
  $CLI decode "$TMP/$name.lac" "$TMP/$name.out.wav"
  t2=$(date +%s.%N)
  if cmp -s "$wav" "$TMP/$name.out.wav"; then
    ok="OK"
  else
    ok="MISMATCH"; status=1
  fi
  in_bytes=$(stat -c%s "$wav"); lac_bytes=$(stat -c%s "$TMP/$name.lac")
  printf "%-30s %s  ratio=%.3f  enc=%.2fs dec=%.2fs\n" "$name" "$ok" \
    "$(echo "$lac_bytes / $in_bytes" | bc -l)" \
    "$(echo "$t1 - $t0" | bc -l)" "$(echo "$t2 - $t1" | bc -l)"
done
exit $status
