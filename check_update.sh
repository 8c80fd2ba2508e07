#!/usr/bin/env bash
# Update check for acestep_tpu deployments (analog of the reference's
# check_update.sh, TPU-host flavored): fetches the upstream branch, reports
# how far behind the checkout is, backs up locally-modified tracked files
# into .update_backup_<ts>/ before pulling, and reminds about the persistent
# XLA compile cache (stale .jax_cache entries are harmless — keyed by HLO —
# but an update that bumps jax invalidates them wholesale).
#
# Usage: ./check_update.sh [--apply] [--remote origin] [--branch main]
set -euo pipefail
cd "$(dirname "${BASH_SOURCE[0]}")"

APPLY=0 REMOTE=origin BRANCH=""
while [[ $# -gt 0 ]]; do
  case "$1" in
    --apply)  APPLY=1 ;;
    --remote) REMOTE="$2"; shift ;;
    --branch) BRANCH="$2"; shift ;;
    *) echo "unknown arg: $1" >&2; exit 2 ;;
  esac
  shift
done

command -v git >/dev/null || { echo "[error] git not found" >&2; exit 1; }
git rev-parse --git-dir >/dev/null 2>&1 || {
  echo "[error] not a git checkout — reinstall from the repository" >&2; exit 1; }

BRANCH="${BRANCH:-$(git rev-parse --abbrev-ref HEAD)}"
echo "[update] checking ${REMOTE}/${BRANCH} ..."
if ! timeout 15 git fetch --quiet "$REMOTE" "$BRANCH" 2>/dev/null; then
  echo "[update] fetch failed (no network from this host?) — skipping" >&2
  exit 0
fi

BEHIND=$(git rev-list --count "HEAD..${REMOTE}/${BRANCH}" 2>/dev/null || echo 0)
AHEAD=$(git rev-list --count "${REMOTE}/${BRANCH}..HEAD" 2>/dev/null || echo 0)
if [[ "$BEHIND" == 0 ]]; then
  echo "[update] up to date (local is $AHEAD ahead)"
  exit 0
fi
echo "[update] $BEHIND new commit(s) available:"
git log --oneline "HEAD..${REMOTE}/${BRANCH}" | head -20

if [[ "$APPLY" != 1 ]]; then
  echo
  echo "Run again with --apply to update (modified configs are backed up)."
  exit 0
fi

# back up locally-modified tracked files so the pull never clobbers a tuned
# config; merge_config.sh restores/diffs them afterwards
MODIFIED=$(git diff --name-only HEAD)
if [[ -n "$MODIFIED" ]]; then
  TS=$(date +%Y%m%d_%H%M%S)
  BK=".update_backup_${TS}"
  mkdir -p "$BK"
  while IFS= read -r f; do
    mkdir -p "$BK/$(dirname "$f")"
    cp -p "$f" "$BK/$f"
    echo "[backup] $f -> $BK/"
  done <<< "$MODIFIED"
  git stash push --quiet -m "check_update auto-stash $TS"
fi

git pull --ff-only "$REMOTE" "$BRANCH"
echo "[update] now at $(git rev-parse --short HEAD)"
echo "[update] note: if jax/libtpu versions changed, clear .jax_cache/ —"
echo "         first compiles after an XLA bump re-populate it (~minutes on"
echo "         the dev tunnel, seconds locally)."
