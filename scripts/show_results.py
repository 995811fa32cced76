"""Pretty-print quality_results.jsonl as a table (newest last)."""

import json
import os
import sys

path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "quality_results.jsonl")
rows = []
with open(path) as f:
    for line in f:
        try:
            rows.append(json.loads(line))
        except json.JSONDecodeError:
            pass

print(f"{'stage':<34} {'si_sdri':>8} {'rtf':>9} {'steps':>6}")
print("-" * 62)
for r in rows:
    print(
        f"{r.get('stage', '?'):<34} "
        f"{r.get('si_sdri', float('nan')):>8.2f} "
        f"{r.get('rtf', float('nan')):>9.4f} "
        f"{r.get('steps', ''):>6}"
    )
