"""Generate an API-reference page per module (mkdocs-gen-files).

Standard mkdocstrings recipe (capability parity with the reference's
docs/gen_ref_pages.py): one ``::: sdfest_tpu.<module>`` page for every
source module, navigated via a literate-nav SUMMARY.md.
"""
from pathlib import Path

import mkdocs_gen_files

PACKAGE = "sdfest_tpu"

nav = mkdocs_gen_files.Nav()

for path in sorted(Path(PACKAGE).rglob("*.py")):
    rel = path.relative_to(PACKAGE)
    parts = list(rel.with_suffix("").parts)
    if parts[-1] in ("__init__", "__main__"):
        continue
    doc_path = rel.with_suffix(".md").as_posix()
    nav[parts] = doc_path
    with mkdocs_gen_files.open(Path("reference", doc_path), "w") as fd:
        fd.write(f"::: {PACKAGE}.{'.'.join(parts)}\n")
    mkdocs_gen_files.set_edit_path(Path("reference", doc_path), path)

with mkdocs_gen_files.open("reference/SUMMARY.md", "w") as nav_file:
    nav_file.writelines(nav.build_literate_nav())
