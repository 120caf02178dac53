import pytest

from aws_dms_to_hudi_spark.session import get_spark

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECT = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        "aws_dms_to_hudi_spark-tests",
        master="local[8]",
        extra_conf={
            "spark.sql.shuffle.partitions": "8",
            "spark.driver.memory": "8g",
        },
    )
    yield s


@pytest.fixture(scope="session")
def sf_smoke():
    return SF_SMOKE


@pytest.fixture(scope="session")
def sf_correct():
    return SF_CORRECT


# --- skip audit (tests/test_zz_skip_audit.py asserts against this) ---
# Every skip that fires in a suite run is recorded here with its reason;
# the audit test (alphabetically last, so it runs after everything under
# default ordering) fails on any reason not on its explained allowlist —
# environment-gated capabilities can't silently rot into permanent skips.
SKIP_REASONS: list[str] = []


def pytest_runtest_logreport(report):
    if report.skipped:
        reason = (
            report.longrepr[2]
            if isinstance(report.longrepr, tuple)
            else str(report.longrepr)
        )
        SKIP_REASONS.append(f"{report.nodeid}: {reason}")
