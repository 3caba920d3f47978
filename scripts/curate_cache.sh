#!/bin/bash
# Curate the committed .jax_cache to exactly the entries a driver `python
# bench.py` run reads or writes (VERDICT r4 item 4 follow-through: the
# committed cache must track the bench programs' current keys, or the df32
# secondary --skip-cold aborts and compile_s blows up).
#
# Usage:
#   scripts/curate_cache.sh mark    # reset atimes to a sentinel past date
#   python bench.py                 # (or any driver-equivalent rehearsal)
#   scripts/curate_cache.sh commit  # stage read/written entries, drop stale
#
# relatime updates atime when atime < mtime or atime is >1 day old, so a
# far-past sentinel guarantees the first read after `mark` bumps it.
set -e
cd "$(dirname "$0")/.."

case "$1" in
  mark)
    touch -a -t 200001010000 .jax_cache/*-cache
    echo "marked $(ls .jax_cache | wc -l) entries"
    ;;
  commit)
    read_set=$(find .jax_cache -name '*-cache' -newerat 2020-06-01)
    n=$(echo "$read_set" | grep -c . || true)
    echo "read/written set: $n entries"
    [ "$n" -gt 0 ] || { echo "nothing read — wrong order of operations?"; exit 1; }
    # stage the read set; unstage+delete tracked entries NOT in the read set
    git add -f $read_set
    for f in $(git ls-files .jax_cache); do
      case "$read_set" in
        *"$f"*) ;;
        *) git rm -q --cached "$f"; echo "dropped stale: $f";;
      esac
    done
    git status --short .jax_cache | grep -v '^??' || true
    du -ch $read_set | tail -1
    ;;
  *)
    echo "usage: $0 mark|commit"; exit 2;;
esac
