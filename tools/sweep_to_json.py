#!/usr/bin/env python3
"""Convert a check_oracle.py text transcript into a correctness artifact.

Usage: python3 tools/sweep_to_json.py <sweep.txt> <sfDir> <out.json>

Produces the committed whole-registry scale-sweep artifact (VERDICT r12 #1):
per-query status/rows plus the summary line, so the 10x-scale gate is a
reviewable JSON instead of a transient stdout. Driver-side tooling only.
"""
import json
import re
import sys


def main():
    src, sf_dir, out = sys.argv[1], sys.argv[2], sys.argv[3]
    queries = {}
    summary = None
    with open(src) as f:
        for line in f:
            line = line.strip()
            m = re.match(r"PASS (\S+) \((\d+) rows\)(?: \[(\d+) near-miss\])?", line)
            if m:
                q = {"status": "pass", "rows": int(m.group(2))}
                if m.group(3):
                    q["near_miss_cells"] = int(m.group(3))
                queries[m.group(1)] = q
                continue
            m = re.match(r"FAIL (\S+): (.*)", line)
            if m:
                queries[m.group(1)] = {"status": "fail", "detail": m.group(2)}
                continue
            m = re.match(r"== (\d+) pass / (\d+) fail ==", line)
            if m:
                summary = {"pass": int(m.group(1)), "fail": int(m.group(2))}
    if summary is None:
        sys.exit(f"no summary line found in {src}")
    artifact = {
        "sf_dir": sf_dir,
        "n_pass": summary["pass"],
        "n_fail": summary["fail"],
        "queries": queries,
    }
    with open(out, "w") as f:
        json.dump(artifact, f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"{out}: {summary['pass']} pass / {summary['fail']} fail")


if __name__ == "__main__":
    main()
