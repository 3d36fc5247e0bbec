#!/usr/bin/env bash
# Dev-side mirror of the driver's LEAKCHECK: the library must be built from
# public knowledge only — no proprietary/internal system names, packages,
# buckets, URLs, or environment variables may appear in the shipped surface.
# Run before committing; exits non-zero and prints offending lines on a hit.
#
# Scope: shipped code + build, NOT the judge/driver artifacts (VERDICT.md
# etc. legitimately discuss the policy itself).
set -u
cd "$(dirname "$0")/.."

PATTERNS=(
  # internal-looking hosts/buckets/schemes
  's3://[a-z0-9._-]*internal'
  'corp[.-]'
  '[a-z0-9-]*\.corp\b'
  'go/[a-z]'
  # proprietary-platform imports a public Spark library cannot have
  'import com\.(google\.internal|amazon|databricks|palantir)'
  # secrets-shaped env vars
  'AKIA[0-9A-Z]{16}'
  'secret_key\|SECRET_KEY'
  'PRIVATE_KEY'
)

FAILED=0
for p in "${PATTERNS[@]}"; do
  hits=$(grep -rInE "$p" src build.sbt project tools 2>/dev/null \
    | grep -v 'tools/leakcheck.sh' || true)
  if [ -n "$hits" ]; then
    echo "LEAK pattern '$p':"
    echo "$hits"
    FAILED=1
  fi
done

# "Internal" as a word is fine when it is a Spark API name
# (withNewChildInternal etc.); flag only suspicious uses near URLs
hits=$(grep -rInE 'https?://[a-z0-9.-]*(internal|corp)' src build.sbt project tools 2>/dev/null \
  | grep -v 'tools/leakcheck.sh' || true)
if [ -n "$hits" ]; then
  echo "LEAK internal URL:"
  echo "$hits"
  FAILED=1
fi

if [ "$FAILED" -eq 0 ]; then
  echo "leakcheck: clean"
fi
exit "$FAILED"
