#!/usr/bin/env bash
# Install the versioned pre-commit hook into .git/hooks (hooks are not
# cloned with the repo; run once per checkout).
set -euo pipefail
cd "$(dirname "$0")/.."
install -m 755 scripts/git_pre_commit.sh .git/hooks/pre-commit
echo "installed .git/hooks/pre-commit"
