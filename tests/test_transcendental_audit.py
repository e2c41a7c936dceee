"""CI guard for the whole-inventory transcendental audit (round 10).

The static half of scripts/audit_transcendentals.py must stay
consistent with the oracle inventory: every oracle whose SQL carries
a libm transcendental (log10/log2/ln/exp/pow/power) needs a
classification row, and the table must not go stale. The expensive
perturbation certificates run via --certify at session close; this
test pins the cheap invariants so an addition can't land
unclassified.
"""

import subprocess
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent


def test_static_audit_passes():
    out = subprocess.run(
        [sys.executable, str(ROOT / "scripts" / "audit_transcendentals.py")],
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert out.returncode == 0, out.stdout + out.stderr
    assert "AUDIT OK" in out.stdout


def test_classification_matches_scan():
    sys.path.insert(0, str(ROOT / "scripts"))
    import audit_transcendentals as at

    oracles = at.load_oracles()
    classes = at.classify(oracles)
    trans = {k for k, v in classes.items() if v == "transcendental"}
    assert trans == set(at.TRANS_CLASS), (
        f"unclassified: {sorted(trans - set(at.TRANS_CLASS))}; "
        f"stale: {sorted(set(at.TRANS_CLASS) - trans)}"
    )
    # the three classes partition the inventory
    assert set(classes.values()) <= {"clean", "round-pinned", "transcendental"}
    assert len(classes) == len(oracles)
