#!/bin/bash
# Time each test file separately (sequential, per-file timeout) -> report.
cd /root/repo
out=/tmp/test_times.txt
: > $out
for f in tests/test_*.py; do
  s=$(date +%s)
  timeout 900 python -m pytest "$f" -q --no-header 2>&1 | tail -1 > /tmp/tt_last.txt
  rc=$?
  e=$(date +%s)
  echo "$((e-s))s rc=$rc $f :: $(cat /tmp/tt_last.txt)" >> $out
done
echo DONE >> $out
