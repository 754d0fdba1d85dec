#!/bin/bash
# Hermetic golden acceptance test (the reference demo's diff discipline,
# /root/reference/demo/runme.sh — inputs regenerated from seeds instead
# of downloaded).  Run from the demo/ directory or anywhere:
#   bash demo/runme.sh [workdir]
set -euo pipefail
HERE="$(cd "$(dirname "$0")" && pwd)"
WORK="${1:-$(mktemp -d)}"
export PYTHONPATH="$HERE/..:${PYTHONPATH:-}"
cd "$WORK"

python "$HERE/make_demo.py" .
# hermetic configuration: host-side filter build + CPU backend so the
# goldens are reproducible on any machine (device and host probes are
# bit-identical — property-tested — so this pins bytes, not behaviour)
NTEDIT_TPU_DEVICE_BUILD=0 JAX_PLATFORMS=cpu \
  python -m ntedit_tpu polish --draft demo_draft.fa --reads demoReads -k 25

gunzip -kf "$HERE/golden_edited.fa.gz" -c > golden_edited.fa
diff -q ntedit_k25_edited.fa golden_edited.fa
diff -q ntedit_k25_changes.tsv "$HERE/golden_changes.tsv"
echo "demo OK: outputs byte-identical to the goldens"
