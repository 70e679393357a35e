"""Connection-config resolution (SURVEY.md §2.A A9).

The reference resolves every engine binding from environment variables with
alias remapping (`REDSHIFT_*` → `POSTGRES_*`,
`/root/reference/images/redshift/entrypoint.sh:33-65`), validates required
parameters up front (`images/snowflake-mcp/entrypoint.sh:121-130`), and
enforces exactly-one-auth (`:144-153`). Here the "connection" is a Parquet
directory + Spark settings; the same resolution/validation semantics apply
at session build.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

# Alias remapping, mirroring the reference's entrypoint env translation
# (images/redshift/entrypoint.sh:33-65): engine-specific names fold onto the
# canonical ones; canonical wins when both are set.
_ALIASES: dict[str, str] = {
    "DTS_DATA_DIR": "SPARK_GRAFT_SF_DIR",
    "DTS_CPUS": "SPARK_GRAFT_CPUS",
    "DTS_SHUFFLE_PARTITIONS": "SPARK_GRAFT_SHUFFLE",
}


class ConfigError(ValueError):
    """Raised for missing/conflicting configuration, mirroring the
    reference's fail-fast entrypoint validation
    (tests/snowflake/test_mcp.py:525-586 asserts specific messages)."""


@dataclass(frozen=True)
class EngineConfig:
    sf_dir: str
    cpus: str = "32"
    shuffle_partitions: str | None = None
    extra_spark_conf: dict[str, str] = field(default_factory=dict)

    def validate(self) -> "EngineConfig":
        if not self.sf_dir:
            raise ConfigError("Missing required parameter: sf_dir (data directory)")
        if not os.path.isdir(self.sf_dir):
            raise ConfigError(f"sf_dir is not a directory: {self.sf_dir!r}")
        if not str(self.cpus).isdigit() and self.cpus != "*":
            raise ConfigError(f"cpus must be an integer or '*': {self.cpus!r}")
        return self


def resolve_env(env: dict[str, str] | None = None) -> EngineConfig:
    """Environment → validated config, with alias remapping."""
    env = dict(os.environ if env is None else env)
    for alias, canonical in _ALIASES.items():
        if alias in env and canonical not in env:
            env[canonical] = env[alias]
    return EngineConfig(
        sf_dir=env.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
        cpus=env.get("SPARK_GRAFT_CPUS", "32"),
        shuffle_partitions=env.get("SPARK_GRAFT_SHUFFLE"),
    ).validate()


# --- service-account-JSON credential materialization ------------------------
# Parity with the reference's BigQuery credential setup
# (images/bigquery/setup-google-credentials.sh:63-112): an inline
# GOOGLE_SERVICE_ACCOUNT_JSON env var is validated, written to a temp file
# with 0600 permissions, exported via GOOGLE_APPLICATION_CREDENTIALS, and
# the project id is surfaced as GOOGLE_CLOUD_PROJECT. Local Spark needs no
# Google auth — the value is exercising the same config contract (e.g. for
# a GCS/BigQuery connector jar on a real cluster).


def validate_service_account_json(json_content: str) -> None:
    """Validation rules and error messages mirror the reference script
    (setup-google-credentials.sh:33-60): JSON object shape, then the
    type/project_id/private_key required fields, checked in that order."""
    s = json_content.strip()
    if not (s.startswith("{") and s.endswith("}")):
        raise ConfigError(
            "Invalid JSON format in GOOGLE_SERVICE_ACCOUNT_JSON - "
            "must be a JSON object"
        )
    import json as _json

    try:
        obj = _json.loads(s)
    except ValueError as e:
        raise ConfigError(
            "Invalid JSON format in GOOGLE_SERVICE_ACCOUNT_JSON - "
            "must be a JSON object"
        ) from e
    if obj.get("type") != "service_account":
        raise ConfigError(
            "JSON does not appear to be a service account - "
            "missing 'type: service_account'"
        )
    if "project_id" not in obj:
        raise ConfigError(
            "Service account JSON missing required 'project_id' field"
        )
    if "private_key" not in obj:
        raise ConfigError(
            "Service account JSON missing required 'private_key' field"
        )


def setup_google_credentials(
    env: dict[str, str] | None = None, temp_dir: str | None = None
) -> str | None:
    """Materialize inline SA JSON to a 0600 temp file; returns the
    credentials path (the new file, the pre-existing
    GOOGLE_APPLICATION_CREDENTIALS, or None when no credentials are
    configured — same precedence as setup-google-credentials.sh:63-112).
    Mutates `env` (or os.environ) like the reference exports. The key file
    is deleted at interpreter exit (atexit), matching the reference's
    cleanup trap (setup-google-credentials.sh cleanup_google_credentials)
    so the private key does not outlive the process."""
    import atexit
    import json as _json
    import tempfile

    environ = os.environ if env is None else env
    inline = environ.get("GOOGLE_SERVICE_ACCOUNT_JSON")
    if not inline:
        return environ.get("GOOGLE_APPLICATION_CREDENTIALS") or None
    validate_service_account_json(inline)
    fd, path = tempfile.mkstemp(
        prefix="sa-credentials-", suffix=".json", dir=temp_dir
    )
    with os.fdopen(fd, "w") as f:
        f.write(inline)
    os.chmod(path, 0o600)

    def _cleanup(p: str = path) -> None:
        try:
            os.unlink(p)
        except OSError:
            pass

    atexit.register(_cleanup)
    environ["GOOGLE_APPLICATION_CREDENTIALS"] = path
    project_id = _json.loads(inline).get("project_id")
    if project_id and project_id != "project_id":
        environ["GOOGLE_CLOUD_PROJECT"] = str(project_id)
    return path
