"""Skip audit: every skip that fired this run must carry one of the
explained, environment-gated reasons below — an unexplained skip is a
capability silently rotting and fails the suite. Named test_zz_* so it
collects last and sees every earlier skip."""

import importlib.util

from tests.conftest import SKIP_REASONS

ALLOWED = (
    # Spark 4's transformWithStateInPandas Python side needs protobuf,
    # which this container lacks; the gated test activates the moment
    # the dependency exists (tests/test_streaming_windows.py).
    # PERMANENTLY ENVIRONMENTAL for now (r6 audit): no protobuf wheel
    # exists anywhere on disk, package installation is prohibited, and
    # the dependency cannot be shimmed — the pb2 state-server protocol
    # needs a wire-format-correct protobuf runtime, not a stub. The
    # same CEP processor semantics ARE covered by the
    # applyInPandasWithState test directly above the gated one.
    "transformWithStateInPandas requires protobuf",
    # rotation tripwire no-ops on a fresh clone with no driver output
    "no committed CORRECTNESS_r*.json yet",
    # empty parametrize set = every queries() entry has an oracle
    "got empty parameter set",
)


def test_all_skips_are_explained():
    bad = [s for s in SKIP_REASONS if not any(a in s for a in ALLOWED)]
    assert not bad, f"unexplained skips: {bad}"


def test_protobuf_gate_is_current():
    """If protobuf ever lands in the environment, the stateful-streaming
    test must RUN — its skip reason may then no longer appear."""
    try:
        # find_spec raises when the parent "google" namespace is absent
        has_protobuf = importlib.util.find_spec("google.protobuf") is not None
    except ModuleNotFoundError:
        has_protobuf = False
    tws_skips = [s for s in SKIP_REASONS if "requires protobuf" in s]
    if has_protobuf:
        assert not tws_skips, "protobuf present but the TWS test skipped"
