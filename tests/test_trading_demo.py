"""Execute the reference's shipped file-based trading analytics demo
(`demo/trading/sql/ctas_file_trading.sql`) VERBATIM over its SHIPPED CSV
data, through the engine's `config_file` YAML source surface (reference
with_clause_parser.rs + yaml_loader.rs: statement-level config_file binds
the FROM source, declared field schemas incl. decimal(p,s) and timestamp
formats replace inference).

The demo is a seven-table CTAS application (market analytics, portfolio
summary, risk analytics, per-day trading performance, sector concentration,
top movers with ROWS WINDOW ranking, and a UNION ALL risk dashboard); key
aggregates are verified against a DuckDB oracle over the same CSVs.
"""

from __future__ import annotations

import os
import shutil

import duckdb
import pytest

REF_TRADING = "/root/reference/demo/trading"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_TRADING), reason="reference trading demo not present"
)


@pytest.fixture(scope="module")
def trading(tmp_path_factory, spark):
    """Run the whole shipped SQL app once from a work dir that mirrors the
    reference repo layout (paths in the YAML configs are repo-root
    relative: ./demo/trading/...)."""
    from velostream_spark.sql.engine import SqlEngine

    root = tmp_path_factory.mktemp("trading_app")
    dst = root / "demo" / "trading"
    dst.parent.mkdir(parents=True, exist_ok=True)
    shutil.copytree(
        REF_TRADING, dst, ignore=shutil.ignore_patterns("*.sh", "monitoring")
    )
    cwd = os.getcwd()
    os.chdir(root)
    try:
        eng = SqlEngine(spark)
        with open(dst / "sql" / "ctas_file_trading.sql") as fh:
            eng.execute_app(fh.read())
    finally:
        os.chdir(cwd)
    return eng


def _oracle(sql: str):
    con = duckdb.connect()
    con.execute(
        f"""
        CREATE VIEW positions AS
        SELECT * FROM read_csv('{REF_TRADING}/data/trading_positions.csv', header=true);
        CREATE VIEW market AS
        SELECT * FROM read_csv('{REF_TRADING}/data/market_data.csv', header=true);
        CREATE VIEW orders AS
        SELECT * FROM read_csv('{REF_TRADING}/data/order_history.csv', header=true);
        """
    )
    return con.sql(sql).fetchall()


def test_all_seven_tables_materialized(trading):
    assert set(trading.tables) >= {
        "market_data_analytics",
        "portfolio_summary",
        "risk_analytics",
        "trading_performance",
        "sector_concentration",
        "top_movers",
        "risk_monitoring_summary",
    }


def test_market_data_analytics_matches_oracle(trading):
    got = sorted(
        (
            r["symbol"],
            r["exchange"],
            round(float(r["spread"]), 4),
            round(float(r["spread_bps"]), 3),
            round(float(r["notional_value"]), 2),
        )
        for r in (
            rr.asDict()
            for rr in trading.tables["market_data_analytics"].df.collect()
        )
    )
    want = sorted(
        (s, e, float(sp), round(float(bps), 3), round(float(nv), 2))
        for s, e, sp, bps, nv in _oracle(
            """
            SELECT symbol, exchange,
                   ROUND(ask_price - bid_price, 4) AS spread,
                   ROUND((ask_price - bid_price) / price * 10000, 3) AS spread_bps,
                   volume * price AS notional
            FROM market WHERE price > 0 AND volume > 0
            """
        )
    )
    assert got == want


def test_portfolio_summary_matches_oracle(trading):
    got = {
        r["trader_id"]: r
        for r in (
            rr.asDict() for rr in trading.tables["portfolio_summary"].df.collect()
        )
    }
    want = _oracle(
        """
        SELECT trader_id,
               COUNT(DISTINCT symbol)            AS num_positions,
               ROUND(SUM(current_pnl), 2)        AS total_pnl,
               ROUND(SUM(ABS(position_size * avg_price)), 2) AS total_exposure
        FROM positions GROUP BY trader_id
        """
    )
    assert len(got) == len(want) == 10
    for trader, n_pos, pnl, exposure in want:
        r = got[trader]
        assert int(r["num_positions"]) == n_pos, trader
        assert abs(float(r["total_pnl"]) - float(pnl)) < 1e-6, trader
        assert abs(float(r["total_exposure"]) - float(exposure)) < 1e-2, trader


def test_sector_concentration_matches_oracle(trading):
    got = {
        r["sector"]: r
        for r in (
            rr.asDict()
            for rr in trading.tables["sector_concentration"].df.collect()
        )
    }
    want = _oracle(
        """
        SELECT sector, COUNT(DISTINCT trader_id) AS num_traders,
               ROUND(SUM(ABS(position_size * avg_price)), 2) AS sector_exposure
        FROM positions
        WHERE sector IS NOT NULL AND position_size != 0
        GROUP BY sector
        """
    )
    assert len(got) == len(want)
    for sector, n_traders, exposure in want:
        r = got[sector]
        assert int(r["num_traders"]) == n_traders, sector
        assert abs(float(r["sector_exposure"]) - float(exposure)) < 1e-2, sector


def test_trading_performance_daily_pnl(trading):
    got = {
        (r["trader_id"], r["symbol"]): r
        for r in (
            rr.asDict()
            for rr in trading.tables["trading_performance"].df.collect()
        )
    }
    want = _oracle(
        """
        SELECT trader_id, symbol, COUNT(*) AS n,
               ROUND(SUM(CASE WHEN side = 'SELL'
                         THEN quantity * price - commission
                         ELSE -(quantity * price + commission) END), 2) AS pnl
        FROM orders WHERE quantity > 0 AND price > 0
        GROUP BY trader_id, symbol
        """
    )
    assert len(got) == len(want) > 0
    for trader, sym, n, pnl in want:
        r = got[(trader, sym)]
        assert int(r["num_trades"]) == n, (trader, sym)
        assert abs(float(r["trading_pnl"]) - float(pnl)) < 1e-2, (trader, sym)


def test_top_movers_ranked_and_limited(trading):
    rows = [r.asDict() for r in trading.tables["top_movers"].df.collect()]
    assert 0 < len(rows) <= 50  # ORDER BY notional_value DESC LIMIT 50
    # price_rank is a ROWS WINDOW ROW_NUMBER over descending price
    by_rank = sorted(rows, key=lambda r: r["price_rank"])
    prices = [float(r["current_price"]) for r in by_rank]
    assert prices == sorted(prices, reverse=True)


def test_risk_monitoring_summary_two_tiers(trading):
    rows = {r["metric_type"]: r.asDict()
            for r in trading.tables["risk_monitoring_summary"].df.collect()}
    assert set(rows) == {"PORTFOLIO_OVERVIEW", "RISK_METRICS"}
    assert int(rows["PORTFOLIO_OVERVIEW"]["total_traders"]) == 10
