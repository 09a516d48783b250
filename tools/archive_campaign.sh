#!/bin/bash
# Archive / restore the scale-25k campaign's newest checkpoint as a
# git-TRACKED tarball.  Round-4 lesson: ckpts/ was .gitignored and the
# driver wipes untracked files between rounds — the 3,500-iteration
# session-1 checkpoint was lost.  Tracked artifacts are the only state
# that survives, so each session ends with `archive` (one tarball,
# replacing the previous one) and begins with `restore` if ckpts/ is
# missing.
#
# Usage: tools/archive_campaign.sh archive|restore
set -e
cd "$(dirname "$0")/.."
DIR=ckpts/train_scale25k/DLA34_box_EMM_SYNCROWD_train_fbox_scale25k
ARCH=ckpts_archive
case "$1" in
  archive)
    LATEST=$(ls -d "$DIR"/model_* 2>/dev/null | sed 's/.*model_//' | sort -n | tail -1)
    [ -n "$LATEST" ] || { echo "no checkpoint under $DIR"; exit 1; }
    mkdir -p "$ARCH"
    rm -f "$ARCH"/scale25k_*.tar.gz
    tar -C "$(dirname "$DIR")" -z --ignore-failed-read -cf \
        "$ARCH/scale25k_${LATEST}.tar.gz" \
        "$(basename "$DIR")/model_${LATEST}" \
        "$(basename "$DIR")/log.txt" \
        "$(basename "$DIR")/config.yaml"
    ls -lh "$ARCH"
    ;;
  restore)
    if [ -d "$DIR" ] && ls "$DIR"/model_* >/dev/null 2>&1; then
      echo "ckpts already present; not touching"; exit 0
    fi
    T=$(ls "$ARCH"/scale25k_*.tar.gz 2>/dev/null | tail -1)
    [ -n "$T" ] || { echo "no archive to restore"; exit 1; }
    mkdir -p "$(dirname "$DIR")"
    tar -C "$(dirname "$DIR")" -z -xf "$T"
    echo "restored $T -> $DIR"; ls "$DIR"
    ;;
  *) echo "usage: $0 archive|restore"; exit 2 ;;
esac
