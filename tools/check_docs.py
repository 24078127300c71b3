"""Docs sanity checker (docs_build.yml): every intra-repo link in docs/*.md
and README.md must resolve, and examples/examples.ipynb must be valid JSON
with executed cells."""
import json
import pathlib
import re
import sys

ROOT = pathlib.Path(__file__).resolve().parent.parent
FAILED = []


def check_links(md_path):
    text = md_path.read_text()
    for m in re.finditer(r"\]\(([^)#:]+)(#[^)]*)?\)", text):
        target = m.group(1).strip()
        if not target or target.startswith(("http", "mailto")):
            continue
        resolved = (md_path.parent / target).resolve()
        if not resolved.exists():
            FAILED.append(f"{md_path}: dead link -> {target}")


def main():
    for md in list((ROOT / "docs").glob("*.md")) + [ROOT / "README.md"]:
        check_links(md)
    nb = ROOT / "examples" / "examples.ipynb"
    if nb.exists():
        payload = json.loads(nb.read_text())
        cells = payload.get("cells", [])
        if not cells:
            FAILED.append("examples.ipynb has no cells")
    for f in FAILED:
        print("FAIL:", f)
    print("docs check:", "FAILED" if FAILED else "OK",
          f"({len(FAILED)} problems)")
    sys.exit(1 if FAILED else 0)


if __name__ == "__main__":
    main()
