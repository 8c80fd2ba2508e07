#!/usr/bin/env bash
# Backup merge helper (analog of the reference's merge_config.sh): after
# check_update.sh --apply stashed local edits into .update_backup_<ts>/,
# list the backups, show diffs against the updated tree, and restore files
# selectively.
#
# Usage:
#   ./merge_config.sh                 list backups + per-file diff summary
#   ./merge_config.sh --diff FILE     full diff for one backed-up file
#   ./merge_config.sh --restore FILE  copy the backed-up version into the tree
#   ./merge_config.sh --backup DIR    operate on a specific backup dir
set -euo pipefail
cd "$(dirname "${BASH_SOURCE[0]}")"

MODE=list TARGET="" BACKUP=""
while [[ $# -gt 0 ]]; do
  case "$1" in
    --diff)    MODE=diff; TARGET="$2"; shift ;;
    --restore) MODE=restore; TARGET="$2"; shift ;;
    --backup)  BACKUP="$2"; shift ;;
    *) echo "unknown arg: $1" >&2; exit 2 ;;
  esac
  shift
done

shopt -s nullglob
BACKUPS=(.update_backup_*)
if [[ ${#BACKUPS[@]} -eq 0 ]]; then
  echo "no .update_backup_* directories found — nothing to merge"
  exit 0
fi
BACKUP="${BACKUP:-${BACKUPS[-1]}}"
[[ -d "$BACKUP" ]] || { echo "[error] backup dir $BACKUP not found" >&2; exit 1; }

case "$MODE" in
  list)
    echo "backups (newest last): ${BACKUPS[*]}"
    echo "using: $BACKUP"
    echo
    while IFS= read -r -d '' f; do
      rel="${f#"$BACKUP"/}"
      if [[ ! -e "$rel" ]]; then
        echo "  $rel — deleted upstream (restore with --restore '$rel')"
      elif cmp -s "$f" "$rel"; then
        echo "  $rel — identical (safe to delete backup)"
      else
        n=$(diff -u "$rel" "$f" | grep -c '^[+-][^+-]' || true)
        echo "  $rel — DIFFERS ($n changed lines; --diff '$rel' to inspect)"
      fi
    done < <(find "$BACKUP" -type f -print0)
    ;;
  diff)
    diff -u "$TARGET" "$BACKUP/$TARGET" || true
    ;;
  restore)
    [[ -f "$BACKUP/$TARGET" ]] || { echo "[error] $TARGET not in $BACKUP" >&2; exit 1; }
    mkdir -p "$(dirname "$TARGET")"
    cp -p "$BACKUP/$TARGET" "$TARGET"
    echo "restored $TARGET from $BACKUP"
    ;;
esac
