#!/usr/bin/env bash
# Style gate — the test/code_format_tests/format.sh analog.
# No astyle/flake8 in the image, so the gate is: every file compiles,
# no tabs in Python, line length <= 100, no trailing whitespace.

set -u
cd "$(dirname "$0")/.."
rc=0

python -m compileall -q qatzip_tpu tools bench.py __graft_entry__.py || rc=1

viol=$(grep -rn $'\t' --include='*.py' qatzip_tpu tools bench.py __graft_entry__.py 2>/dev/null | head -5)
if [ -n "$viol" ]; then echo "TABS FOUND:"; echo "$viol"; rc=1; fi

long=$(grep -rnE '.{101,}' --include='*.py' qatzip_tpu tools bench.py __graft_entry__.py 2>/dev/null | head -5)
if [ -n "$long" ]; then echo "LINES >100 CHARS:"; echo "$long"; rc=1; fi

trail=$(grep -rnE ' +$' --include='*.py' qatzip_tpu tools 2>/dev/null | head -5)
if [ -n "$trail" ]; then echo "TRAILING WHITESPACE:"; echo "$trail"; rc=1; fi

[ $rc -eq 0 ] && echo "style: OK"
exit $rc
