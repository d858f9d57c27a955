#!/usr/bin/env python3
"""Extract one query's plan block from a PLANS.md into plans/r17/<q>_<tag>.txt."""
import sys, re, pathlib
src, query, out = sys.argv[1], sys.argv[2], sys.argv[3]
txt = pathlib.Path(src).read_text()
m = re.search(rf"^## {re.escape(query)}\n\n```\n(.*?)\n```", txt, re.S | re.M)
if not m:
    sys.exit(f"no plan for {query} in {src}")
pathlib.Path(out).parent.mkdir(parents=True, exist_ok=True)
pathlib.Path(out).write_text(m.group(1) + "\n")
print("wrote", out)
