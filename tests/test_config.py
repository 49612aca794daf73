"""Env-driven settings (reference config.py:33-177 parity): env/.env
precedence, validation bounds, and the CLI reading them."""

from __future__ import annotations

import json

import pytest

from news_crawler_spark.config import Settings, SettingsError


def test_defaults():
    s = Settings.from_env(env={}, env_file=None)
    assert s.news_limit == 10 and s.max_attempts == 3
    assert s.cron_times == ("06:00",) and s.enable_ipset


def test_env_overrides_and_types():
    s = Settings.from_env(env={
        "NCS_NEWS_LIMIT": "25",
        "NCS_CRON_TIMES": "06:00, 18:30",
        "NCS_ENABLE_SURICATA": "off",
        "NCS_STATE_DIR": "/tmp/x",
        "NCS_RETRY_JITTER_SPAN": "2",
    }, env_file=None)
    assert s.news_limit == 25
    assert s.cron_times == ("06:00", "18:30")
    assert s.enable_suricata is False and s.enable_ipset is True
    assert s.state_dir == "/tmp/x" and s.retry_jitter_span == 2


@pytest.mark.parametrize("env", [
    {"NCS_NEWS_LIMIT": "0"},        # ge bound (reference: ge=1)
    {"NCS_NEWS_LIMIT": "51"},       # le bound (reference: le=50)
    {"NCS_ASEC_POST_LIMIT": "21"},  # le=20
    {"NCS_MAX_ATTEMPTS": "eleven"},
    {"NCS_CRON_TIMES": "25:00"},
    {"NCS_ENABLE_IPSET": "maybe"},
])
def test_validation_bounds(env):
    with pytest.raises(SettingsError):
        Settings.from_env(env=env, env_file=None)


def test_env_file_and_precedence(tmp_path):
    envf = tmp_path / ".env"
    envf.write_text("# comment\nNCS_NEWS_LIMIT=30\nNCS_ADVISORY_LIMIT='7'\n")
    s = Settings.from_env(env={"NCS_NEWS_LIMIT": "40"}, env_file=str(envf))
    assert s.news_limit == 40      # process env wins
    assert s.advisory_limit == 7   # .env quote-stripped


def test_cli_reads_env(spark, tmp_path, monkeypatch, capsys):
    """F7/ops parity: NCS_STATE_DIR and NCS_MAX_ATTEMPTS configure a
    crawl run with no corresponding flags."""
    from news_crawler_spark import cli

    monkeypatch.setenv("NCS_STATE_DIR", str(tmp_path / "state"))
    monkeypatch.setenv("NCS_MAX_ATTEMPTS", "2")
    rc = cli.main(["crawl", "--rounds", "2", "--n-hosts", "2",
                   "--pages-per-host", "6", "--n-seeds", "2", "--cpus", "4"])
    assert rc == 0
    lines = [json.loads(x) for x in capsys.readouterr().out.strip().splitlines()]
    assert lines[0]["round"] == 0 and lines[0]["scheduled"] > 0
    assert (tmp_path / "state" / "lineage").is_dir()


def test_cli_requires_state_dir(monkeypatch):
    from news_crawler_spark import cli

    monkeypatch.delenv("NCS_STATE_DIR", raising=False)
    with pytest.raises(SystemExit):
        cli.main(["crawl", "--rounds", "1"])


def test_cli_malformed_env_is_clean_error_and_spares_bench(monkeypatch, capsys):
    """A malformed NCS_* env var must surface through parser.error()
    (clean exit code 2 + message) for settings-consuming subcommands,
    NOT a raw SettingsError traceback — and must not take down
    subcommands that never read settings (--help still works)."""
    import pytest

    from news_crawler_spark import cli

    monkeypatch.setenv("NCS_MAX_ATTEMPTS", "0")  # out of bounds 1..10
    with pytest.raises(SystemExit) as ei:
        cli.main(["crawl", "--state-dir", "/tmp/x", "--rounds", "0"])
    assert ei.value.code == 2
    assert "invalid environment settings" in capsys.readouterr().err
    # parser construction (incl. help for other subcommands) survives
    with pytest.raises(SystemExit) as ei:
        cli.main(["--help"])
    assert ei.value.code == 0


def test_cli_rejects_out_of_bounds_flags():
    """The CLI path enforces the same bounds as the env path — an
    out-of-range --max-attempts must error, not silently kill retries."""
    import pytest

    from news_crawler_spark.cli import main

    with pytest.raises(SystemExit):
        main(["crawl", "--state-dir", "/tmp/x", "--max-attempts", "0",
              "--rounds", "0"])
    with pytest.raises(SystemExit):
        main(["crawl", "--state-dir", "/tmp/x", "--retry-jitter", "99",
              "--rounds", "0"])


def test_cli_ingest_subcommand(spark, tmp_path, capsys):
    """ingest subcommand: classifies a parquet batch against persisted
    state, prints verdict counts, replays idempotently, compacts on
    request."""
    import json as _json

    from news_crawler_spark import cli

    batch1 = str(tmp_path / "b1.parquet")
    batch2 = str(tmp_path / "b2.parquet")
    base = "the quick brown fox jumps over the lazy dog " * 4
    spark.createDataFrame(
        [(1, base + "one"), (2, "unrelated text about databases")],
        "doc_id long, text string").write.parquet(batch1)
    spark.createDataFrame(
        [(11, base + "one"), (12, "fresh content here")],
        "doc_id long, text string").write.parquet(batch2)
    state = str(tmp_path / "state")

    rc = cli.main(["ingest", "--state-dir", state,
                   "--batch", batch1, "--batch-id", "b1"])
    assert rc == 0
    out1 = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out1["n_docs"] == 2 and out1["new"] == 2

    rc = cli.main(["ingest", "--state-dir", state,
                   "--batch", batch2, "--batch-id", "b2", "--compact"])
    assert rc == 0
    out2 = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out2["exact_dup"] == 1 and out2["new"] == 1
    assert out2["compact"]["bands_after"] <= out2["compact"]["bands_before"]

    # idempotent replay: same batch-id, same counts, no re-ingest
    rc = cli.main(["ingest", "--state-dir", state,
                   "--batch", batch2, "--batch-id", "b2"])
    assert rc == 0
    out3 = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out3["exact_dup"] == 1 and out3["new"] == 1


def test_cli_ingest_requires_state_dir(monkeypatch):
    import pytest as _pytest

    from news_crawler_spark import cli

    monkeypatch.delenv("NCS_STATE_DIR", raising=False)
    with _pytest.raises(SystemExit):
        cli.main(["ingest", "--batch", "/tmp/x", "--batch-id", "b"])
