"""Build tokens_ts.zip for spark-submit --py-files."""

import zipfile
from pathlib import Path

root = Path(__file__).resolve().parent.parent
out = root / "tokens_ts.zip"
with zipfile.ZipFile(out, "w") as z:
    for p in sorted((root / "tokens_ts").rglob("*.py")):
        z.write(p, p.relative_to(root))
print(out)
