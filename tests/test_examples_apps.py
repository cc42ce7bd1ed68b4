"""Execute the reference's shipped `examples/*.sql` analytics apps VERBATIM
through SqlEngine over the mock-transport seam, with DuckDB oracles.

These are the reference's most realistic multi-statement applications
(ecommerce, IoT, social media, financial trading + the phase4 variants).
They ship without input data or expected outputs, so — like the tier1/tier2
harness (test_harness_examples.py) — each test generates deterministic
input records in the shape the Kafka source builder would yield
post-decode, registers them under the app's source names, runs the SHIPPED
SQL text unmodified via ``execute_app``, and verifies the materialized
streams against DuckDB oracles over the SAME generated inputs.

NOW()-anchored predicates (``timestamp >= NOW() - INTERVAL '1' HOUR``) are
satisfied by construction: event timestamps are generated within minutes of
the real wall clock, and NOW()-derived output columns are excluded from
oracle comparison (they are nondeterministic by definition).

Window buckets are verified bucket-faithfully: oracles reproduce the
engine's epoch-aligned tumbling bucket with floor(epoch(ts)/width)
arithmetic, so a corpus that happens to straddle a bucket boundary still
compares exactly.
"""

from __future__ import annotations

import datetime as dt
import json
import os

import duckdb
import numpy as np
import pandas as pd
import pytest

from pyspark.sql import functions as F

EXAMPLES = "/root/reference/examples"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(EXAMPLES), reason="reference examples not present"
)


def _read_app(stem: str) -> str:
    with open(os.path.join(EXAMPLES, f"{stem}.sql")) as fh:
        return fh.read()


def _now() -> dt.datetime:
    return dt.datetime.now()


def _with_event_time(spark, pdf: pd.DataFrame, ts_col: str | None, ddl: str | None = None):
    if ddl is not None:
        # explicit-DDL path: pandas' NA/NaN become real Spark NULLs (the
        # pandas→Arrow fast path turns nullable ints into NaN doubles)
        records = [
            tuple(
                None
                if pd.isna(v)
                else (
                    v.to_pydatetime()
                    if isinstance(v, pd.Timestamp)
                    else v.item()
                    if isinstance(v, np.generic)
                    else v
                )
                for v in t
            )
            for t in pdf.itertuples(index=False, name=None)
        ]
        df = spark.createDataFrame(records, ddl)
    else:
        df = spark.createDataFrame(pdf)
    if ts_col is not None:
        df = df.withColumn("_event_time", F.col(ts_col))
    return df


def _oracle_con(frames: dict[str, pd.DataFrame]) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name, pdf in frames.items():
        con.register(name, pdf)
    return con


def _rows(df, drop: tuple[str, ...] = ()) -> list[tuple]:
    cols = [c for c in df.columns if c not in drop and not c.startswith("_")]
    pdf = df.select(cols).toPandas()
    out = []
    for t in pdf.itertuples(index=False, name=None):
        out.append(
            tuple(
                round(v, 6) if isinstance(v, float) else v
                for v in t
            )
        )
    return sorted(out, key=repr)


def _oracle_rows(con, sql: str) -> list[tuple]:
    import decimal

    out = []
    for t in con.execute(sql).fetchall():
        out.append(
            tuple(
                round(float(v), 6)
                if isinstance(v, (float, decimal.Decimal))
                else v
                for v in t
            )
        )
    return sorted(out, key=repr)


# ---------------------------------------------------------------------------
# ecommerce_analytics.sql
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def ecommerce(spark):
    from velostream_spark.sql.engine import SqlEngine

    rng = np.random.default_rng(11)
    n = 400
    base = _now() - dt.timedelta(minutes=5)
    ts = [base + dt.timedelta(seconds=int(s)) for s in rng.integers(0, 240, n)]
    orders = pd.DataFrame(
        {
            "customer_id": rng.integers(1, 40, n),
            "order_id": np.arange(1, n + 1),
            "amount": np.round(rng.uniform(10, 8000, n), 2),
            "payment_method": rng.choice(
                ["credit_card", "paypal", "wire"], n
            ),
            "ts": ts,
        }
    )
    actions = rng.choice(
        ["purchase", "add_to_cart", "view_product", "scroll"], n
    )
    user_events = pd.DataFrame(
        {
            "payload": [
                json.dumps(
                    {
                        "user_id": f"u{int(u)}",
                        "action": a,
                        "page": f"/p/{int(p)}",
                        "session_duration": int(d),
                        "product_id": f"prod{int(p)}",
                        "category": ["home", "tech", "toys"][int(p) % 3],
                        "price": round(float(pr), 2),
                    }
                )
                for u, a, p, d, pr in zip(
                    rng.integers(1, 50, n),
                    actions,
                    rng.integers(1, 30, n),
                    rng.integers(5, 600, n),
                    rng.uniform(1, 500, n),
                )
            ],
            "ts": ts,
        }
    )

    eng = SqlEngine(spark)
    eng.register_stream("orders", _with_event_time(spark, orders, "ts"))
    eng.register_stream("user_events", _with_event_time(spark, user_events, "ts"))
    eng.register_stream(
        "product_events", _with_event_time(spark, user_events, "ts")
    )
    eng.execute_app(_read_app("ecommerce_analytics"))
    return eng, _oracle_con({"orders": orders, "user_events": user_events})


def test_ecommerce_all_streams_materialized(ecommerce):
    eng, _ = ecommerce
    assert set(eng.streams) >= {
        "high_value_orders_stream",
        "user_analytics_stream",
        "fraud_alerts",
        "customer_segments",
        "product_analytics_stream",
    }


def test_ecommerce_high_value_orders(ecommerce):
    eng, con = ecommerce
    got = _rows(eng.streams["high_value_orders_stream"], drop=("processed_at",))
    want = _oracle_rows(
        con,
        "SELECT customer_id, order_id, amount FROM orders WHERE amount > 1000",
    )
    assert got == want


def test_ecommerce_fraud_alerts(ecommerce):
    eng, con = ecommerce
    got = _rows(eng.streams["fraud_alerts"], drop=("flagged_at",))
    want = _oracle_rows(
        con,
        """
        SELECT customer_id, order_id, amount, payment_method,
               CASE WHEN amount > 5000 AND payment_method = 'credit_card'
                    THEN 'HIGH_RISK'
                    WHEN amount > 2000 THEN 'MEDIUM_RISK'
                    ELSE 'LOW_RISK' END AS risk_level
        FROM orders WHERE amount > 500
        """,
    )
    assert got == want


def test_ecommerce_user_analytics(ecommerce):
    eng, con = ecommerce
    got = _rows(eng.streams["user_analytics_stream"])
    want = _oracle_rows(
        con,
        """
        SELECT payload->>'$.user_id' AS user_id,
               payload->>'$.action' AS action,
               payload->>'$.page' AS page_visited,
               CAST(payload->>'$.session_duration' AS INTEGER) AS session_duration
        FROM user_events
        WHERE payload->>'$.action' IN ('purchase', 'add_to_cart', 'view_product')
        """,
    )
    assert got == want


def test_ecommerce_customer_segments(ecommerce):
    eng, con = ecommerce
    df = eng.streams["customer_segments"]
    got = _rows(df)
    want = _oracle_rows(
        con,
        """
        SELECT customer_id,
               COUNT(*) AS order_count,
               SUM(amount) AS total_spent,
               AVG(amount) AS avg_order_value,
               CASE WHEN SUM(amount) > 10000 THEN 'VIP'
                    WHEN SUM(amount) > 1000 THEN 'PREMIUM'
                    ELSE 'STANDARD' END AS customer_tier
        FROM orders
        GROUP BY customer_id, floor(epoch(ts) / 3600)
        """,
    )
    assert got == want


def test_ecommerce_product_analytics(ecommerce):
    eng, con = ecommerce
    got = _rows(eng.streams["product_analytics_stream"])
    want = _oracle_rows(
        con,
        """
        SELECT payload->>'$.product_id' AS product_id,
               payload->>'$.category' AS category,
               COUNT(*) AS view_count,
               COUNT(CASE WHEN payload->>'$.action' = 'purchase' THEN 1 END)
                   AS purchase_count,
               AVG(CAST(payload->>'$.price' AS FLOAT)) AS avg_price
        FROM user_events
        GROUP BY 1, 2, floor(epoch(ts) / 1800)
        """,
    )
    assert got == want


# ---------------------------------------------------------------------------
# iot_monitoring.sql
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def iot(spark):
    from velostream_spark.sql.engine import SqlEngine

    rng = np.random.default_rng(23)
    n = 600
    base = _now() - dt.timedelta(minutes=4)
    ts = [base + dt.timedelta(seconds=int(s)) for s in rng.integers(0, 180, n)]
    sensor_data = pd.DataFrame(
        {
            "device_id": [f"dev{int(i):02d}" for i in rng.integers(1, 12, n)],
            "sensor_type": rng.choice(
                ["temperature", "pressure", "vibration"], n
            ),
            "temperature": np.round(rng.uniform(40, 110, n), 2),
            "pressure": np.round(rng.uniform(1, 40, n), 2),
            "vibration_level": np.round(rng.uniform(0, 10, n), 2),
            "location": rng.choice(["plant_a", "plant_b"], n),
            "timestamp": ts,
        }
    )
    m = 40
    device_status = pd.DataFrame(
        {
            "device_id": [f"dev{int(i):02d}" for i in rng.integers(1, 12, m)],
            "location": rng.choice(["plant_a", "plant_b"], m),
            "battery_level": pd.array(
                [
                    None if rng.uniform() < 0.15 else int(v)
                    for v in rng.integers(1, 100, m)
                ],
                dtype="Int64",
            ),
            "last_charge_time": [
                _now() - dt.timedelta(hours=int(h), minutes=30)
                for h in rng.integers(1, 48, m)
            ],
        }
    )

    eng = SqlEngine(spark)
    eng.register_stream(
        "sensor_data", _with_event_time(spark, sensor_data, "timestamp")
    )
    eng.register_stream(
        "device_status",
        _with_event_time(
            spark,
            device_status,
            None,
            ddl="device_id string, location string, battery_level bigint, "
            "last_charge_time timestamp",
        ),
    )
    eng.execute_app(_read_app("iot_monitoring"))
    return eng, _oracle_con(
        {"sensor_data": sensor_data, "device_status": device_status}
    )


def test_iot_all_streams_materialized(iot):
    eng, _ = iot
    assert set(eng.streams) >= {
        "critical_alerts",
        "pressure_alerts",
        "vibration_analytics",
        "battery_alerts",
        "sensor_health_reports",
    }


def test_iot_critical_alerts(iot):
    eng, con = iot
    got = _rows(eng.streams["critical_alerts"], drop=("alert_time",))
    want = _oracle_rows(
        con,
        """
        SELECT device_id, sensor_type, temperature, location,
               'TEMPERATURE_HIGH' AS alert_type
        FROM sensor_data
        WHERE sensor_type = 'temperature' AND temperature > 80
        """,
    )
    assert got == want and len(got) > 0


def test_iot_pressure_alerts(iot):
    eng, con = iot
    got = _rows(eng.streams["pressure_alerts"], drop=("alert_time",))
    want = _oracle_rows(
        con,
        """
        SELECT device_id, sensor_type, pressure, location,
               CASE WHEN pressure < 5 THEN 'CRITICAL_LOW'
                    WHEN pressure < 10 THEN 'WARNING_LOW'
                    ELSE 'NORMAL' END AS pressure_status
        FROM sensor_data
        WHERE sensor_type = 'pressure' AND pressure < 15
        """,
    )
    assert got == want and len(got) > 0


def test_iot_vibration_analytics(iot):
    eng, con = iot
    got = _rows(eng.streams["vibration_analytics"])
    want = _oracle_rows(
        con,
        """
        SELECT device_id, location,
               AVG(vibration_level) AS avg_vibration,
               MAX(vibration_level) AS peak_vibration,
               COUNT(*) AS reading_count,
               CASE WHEN MAX(vibration_level) > 8.0 THEN 'CRITICAL'
                    WHEN AVG(vibration_level) > 5.0 THEN 'HIGH'
                    ELSE 'NORMAL' END AS vibration_status
        FROM sensor_data
        WHERE sensor_type = 'vibration'
        GROUP BY device_id, location, floor(epoch("timestamp") / 600)
        """,
    )
    assert got == want and len(got) > 0


def test_iot_battery_alerts(iot):
    eng, con = iot
    # hours_since_charge is NOW()-anchored; verify the deterministic columns
    got = _rows(
        eng.streams["battery_alerts"],
        drop=("hours_since_charge", "last_charge_time"),
    )
    want = _oracle_rows(
        con,
        """
        SELECT device_id, location, battery_level,
               CASE WHEN battery_level < 5 THEN 'CRITICAL'
                    WHEN battery_level < 20 THEN 'LOW'
                    WHEN battery_level < 50 THEN 'MEDIUM'
                    ELSE 'GOOD' END AS battery_status
        FROM device_status WHERE battery_level IS NOT NULL
        """,
    )
    assert got == want and len(got) > 0
    # the generated last_charge_times are 1-48h old, so the NOW()-anchored
    # DATEDIFF must land in [0, 49]
    hrs = [
        r["hours_since_charge"]
        for r in eng.streams["battery_alerts"].collect()
    ]
    assert all(0 <= h <= 49 for h in hrs)


def test_iot_sensor_health(iot):
    eng, con = iot
    got = _rows(
        eng.streams["sensor_health_reports"],
        drop=("minutes_since_last_reading", "last_reading"),
    )
    # all generated readings are minutes old and >=1 per group by
    # construction, so TIMEOUT/OFFLINE can't occur: health is
    # DEGRADED (<10 readings) or HEALTHY
    want = _oracle_rows(
        con,
        """
        SELECT device_id, location, sensor_type,
               COUNT(*) AS reading_count,
               CASE WHEN COUNT(*) < 10 THEN 'DEGRADED'
                    ELSE 'HEALTHY' END AS health_status
        FROM sensor_data
        GROUP BY device_id, location, sensor_type, floor(epoch("timestamp") / 3600)
        """,
    )
    assert got == want and len(got) > 0


# ---------------------------------------------------------------------------
# social_media_analytics.sql
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def social(spark):
    from velostream_spark.sql.engine import SqlEngine

    rng = np.random.default_rng(37)
    rows = []
    base = _now() - dt.timedelta(minutes=5)

    def mk(i, content, likes, shares, comments, views, follower, user=None):
        return {
            "post_id": i,
            "user_id": int(user if user is not None else rng.integers(1, 200)),
            "username": f"user{int(user if user is not None else 0):04d}",
            "content": content,
            "likes_count": int(likes),
            "shares_count": int(shares),
            "comments_count": int(comments),
            "views_count": int(views),
            "engagement_score": float(likes + shares + comments),
            "follower_count": int(follower),
            "merchant_category": ["retail", "food", None][i % 3],
            "location": ["nyc", "sf", "london"][i % 3],
            "timestamp": base + dt.timedelta(seconds=int(rng.integers(0, 240))),
        }

    i = 0
    # 130 posts sharing one 20-char hashtag prefix → trending (HAVING > 100)
    for _ in range(130):
        rows.append(
            mk(i, "#megasale this week only wow", 10, 2, 1, 500, 100)
        )
        i += 1
    # viral posts: engagement > 10000 and rate > 0.1
    for _ in range(8):
        rows.append(mk(i, "I love this amazing product!!!", 9000, 800, 300, 20000, 5000))
        i += 1
    # influencer: one user with 9 posts and > 10k followers
    for _ in range(9):
        rows.append(
            mk(i, "daily great thoughts of an influencer", 50, 5, 2, 800, 50000, user=7)
        )
        i += 1
    # crisis: 60 posts mentioning emergency within the last 10 minutes
    for _ in range(60):
        rows.append(mk(i, "there is an emergency downtown right now", 3, 1, 0, 100, 200))
        i += 1
    # background chatter
    for _ in range(80):
        rows.append(mk(i, f"ordinary terrible post number {i}", 1, 0, 0, 50, 10))
        i += 1

    social_posts = pd.DataFrame(rows)
    from velostream_spark.sql.engine import SqlEngine as _E  # noqa: F401

    eng = SqlEngine(spark)
    eng.register_stream(
        "social_posts", _with_event_time(spark, social_posts, "timestamp")
    )
    eng.execute_app(_read_app("social_media_analytics"))
    return eng, _oracle_con({"social_posts": social_posts})


def test_social_all_streams_materialized(social):
    eng, _ = social
    assert set(eng.streams) >= {
        "trending_hashtags",
        "viral_content_alerts",
        "sentiment_analysis",
        "influencer_activity",
        "crisis_alerts",
    }


def test_social_trending_hashtags(social):
    eng, con = social
    got = _rows(eng.streams["trending_hashtags"], drop=("trending_time",))
    want = _oracle_rows(
        con,
        """
        SELECT SUBSTRING(content, 1, 20) AS hashtag,
               COUNT(*) AS mention_count,
               COUNT(user_id) AS unique_users,
               AVG(engagement_score) AS avg_engagement
        FROM social_posts
        WHERE content LIKE '%#%'
        GROUP BY SUBSTRING(content, 1, 20), floor(epoch("timestamp") / 3600)
        HAVING COUNT(*) > 100
        """,
    )
    assert got == want and len(got) >= 1


def test_social_sentiment(social):
    eng, con = social
    got = _rows(eng.streams["sentiment_analysis"], drop=("analyzed_at",))
    want = _oracle_rows(
        con,
        """
        SELECT post_id, user_id, content,
               CASE WHEN content LIKE '%love%' OR content LIKE '%great%'
                      OR content LIKE '%amazing%' THEN 'POSITIVE'
                    WHEN content LIKE '%hate%' OR content LIKE '%terrible%'
                      OR content LIKE '%awful%' THEN 'NEGATIVE'
                    ELSE 'NEUTRAL' END AS sentiment,
               CASE WHEN content LIKE '%!%' OR content LIKE '%!!!%' THEN 'HIGH'
                    WHEN content LIKE '%?%' THEN 'MEDIUM'
                    ELSE 'LOW' END AS emotion_intensity,
               LENGTH(content) AS content_length
        FROM social_posts
        WHERE content IS NOT NULL AND LENGTH(content) > 10
        """,
    )
    assert got == want


def test_social_viral_alerts(social):
    eng, con = social
    got = _rows(eng.streams["viral_content_alerts"], drop=("viral_detected_time",))
    want = _oracle_rows(
        con,
        """
        SELECT post_id, user_id, content, likes_count, shares_count,
               comments_count,
               (likes_count + shares_count * 2 + comments_count * 3)
                   AS engagement_score,
               views_count,
               (likes_count + shares_count * 2 + comments_count * 3)
                   / GREATEST(views_count, 1) AS engagement_rate
        FROM social_posts
        WHERE (likes_count + shares_count * 2 + comments_count * 3) > 10000
          AND (likes_count + shares_count * 2 + comments_count * 3)
                   / GREATEST(views_count, 1) > 0.1
        """,
    )
    assert got == want and len(got) == 8  # the 8 generated viral posts


def test_social_influencer_activity(social):
    eng, con = social
    got = _rows(eng.streams["influencer_activity"], drop=("monitoring_time",))
    want = _oracle_rows(
        con,
        """
        SELECT user_id, username, follower_count,
               COUNT(*) AS post_count_1h,
               SUM(likes_count + shares_count + comments_count)
                   AS total_engagement_1h,
               AVG(likes_count + shares_count + comments_count)
                   AS avg_engagement_per_post,
               MAX(likes_count + shares_count + comments_count)
                   AS max_engagement,
               COUNT(merchant_category) AS categories_visited
        FROM social_posts
        WHERE follower_count > 10000
        GROUP BY user_id, username, follower_count,
                 floor(epoch("timestamp") / 3600)
        HAVING COUNT(*) > 5
        """,
    )
    assert got == want and len(got) >= 1


def test_social_crisis_alerts(social):
    eng, con = social
    got = _rows(
        eng.streams["crisis_alerts"],
        drop=("detection_time", "first_mention", "latest_mention"),
    )
    want = _oracle_rows(
        con,
        """
        SELECT 'CRISIS_ALERT' AS alert_type,
               CASE WHEN content LIKE '%disaster%' OR content LIKE '%emergency%'
                      THEN 'DISASTER'
                    WHEN content LIKE '%breaking%' OR content LIKE '%urgent%'
                      THEN 'BREAKING_NEWS'
                    WHEN content LIKE '%fire%' OR content LIKE '%earthquake%'
                      THEN 'NATURAL_DISASTER'
                    ELSE 'GENERAL_CRISIS' END AS crisis_category,
               COUNT(*) AS mention_count,
               COUNT(user_id) AS unique_reporters,
               STRING_AGG(location, ', ') AS affected_locations
        FROM social_posts
        WHERE content LIKE '%disaster%' OR content LIKE '%emergency%'
           OR content LIKE '%breaking%' OR content LIKE '%urgent%'
           OR content LIKE '%fire%' OR content LIKE '%earthquake%'
        GROUP BY 2
        HAVING COUNT(*) > 50
        """,
    )
    # LISTAGG order is engine-defined; compare the multiset of locations
    def norm(rows):
        return sorted(
            (a, b, c, d, tuple(sorted(e.split(", "))))
            for a, b, c, d, e in rows
        )

    assert norm(got) == norm(want) and len(got) == 1


# ---------------------------------------------------------------------------
# financial_trading_with_metrics.sql
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def financial(spark):
    from velostream_spark.sql.engine import SqlEngine

    rng = np.random.default_rng(53)
    n = 300
    base = _now() - dt.timedelta(minutes=3)
    evt = [base + dt.timedelta(seconds=int(s)) for s in rng.integers(0, 120, n)]
    bid = np.round(rng.uniform(10, 500, n), 2)
    market_data = pd.DataFrame(
        {
            "symbol": rng.choice(["AAPL", "GOOG", "MSFT", "TSLA"], n),
            "exchange": rng.choice(["NASDAQ", "NYSE"], n),
            "volume": rng.integers(100, 1_000_000, n).astype("float"),
            "hourly_avg_volume": rng.integers(1000, 400_000, n).astype("float"),
            "price": np.round(bid * rng.uniform(1.0, 1.01, n), 2),
            "bid_price": bid,
            "ask_price": np.round(bid * rng.uniform(1.0, 1.02, n), 2),
            "spread": np.round(rng.uniform(0.01, 2.0, n), 4),
            "event_time": evt,
        }
    )
    enriched = market_data.assign(
        trader_id=[f"t{int(v):03d}" for v in rng.integers(1, 300, n)],
        trader_volume_rank=rng.integers(1, 500, n),
    )
    trade_executions = pd.DataFrame(
        {
            "exchange": rng.choice(["NASDAQ", "NYSE"], n),
            "order_type": rng.choice(["market", "limit"], n),
            "symbol": rng.choice(["AAPL", "GOOG"], n),
            "order_time": evt,
            "execution_time": [
                t + dt.timedelta(milliseconds=int(ms))
                for t, ms in zip(evt, rng.integers(1, 5000, n))
            ],
            "event_time": evt,
        }
    )
    order_book = pd.DataFrame(
        {
            "symbol": rng.choice(["AAPL", "GOOG"], n),
            "exchange": rng.choice(["NASDAQ", "NYSE"], n),
            "bid_volume": rng.integers(0, 10_000, n).astype("float"),
            "ask_volume": rng.integers(0, 10_000, n).astype("float"),
            "event_time": evt,
        }
    )

    eng = SqlEngine(spark)
    eng.register_stream(
        "market_data", _with_event_time(spark, market_data, "event_time")
    )
    eng.register_stream(
        "enriched_market_data", _with_event_time(spark, enriched, "event_time")
    )
    eng.register_stream(
        "trade_executions",
        _with_event_time(spark, trade_executions, "event_time"),
    )
    eng.register_stream(
        "order_book_snapshots", _with_event_time(spark, order_book, "event_time")
    )
    eng.execute_app(_read_app("financial_trading_with_metrics"))
    return eng, _oracle_con(
        {
            "market_data": market_data,
            "enriched_market_data": enriched,
            "trade_executions": trade_executions,
            "order_book_snapshots": order_book,
        }
    )


def test_financial_all_streams_materialized(financial):
    eng, _ = financial
    assert set(eng.streams) >= {
        "volume_spike_alerts",
        "price_monitoring",
        "high_value_trades",
        "trading_latency",
        "spread_monitoring",
        "order_imbalance_alerts",
    }


def test_financial_volume_spikes(financial):
    eng, con = financial
    got = _rows(eng.streams["volume_spike_alerts"], drop=("event_time",))
    want = _oracle_rows(
        con,
        """
        SELECT symbol, exchange, volume, hourly_avg_volume,
               volume / hourly_avg_volume AS spike_ratio, price
        FROM market_data WHERE volume > hourly_avg_volume * 2.0
        """,
    )
    assert got == want and len(got) > 0


def test_financial_high_value_trades(financial):
    eng, con = financial
    got = _rows(eng.streams["high_value_trades"], drop=("event_time",))
    want = _oracle_rows(
        con,
        """
        SELECT symbol, exchange, trader_id,
               CASE WHEN trader_volume_rank <= 10 THEN 'institutional'
                    WHEN trader_volume_rank <= 100 THEN 'professional'
                    ELSE 'retail' END AS trader_tier,
               price, volume, price * volume AS notional_value
        FROM enriched_market_data WHERE price * volume > 1000000
        """,
    )
    assert got == want and len(got) > 0


def test_financial_latency(financial):
    eng, con = financial
    got = _rows(eng.streams["trading_latency"], drop=("event_time",))
    want = _oracle_rows(
        con,
        """
        SELECT exchange, order_type, symbol,
               EXTRACT(EPOCH FROM (execution_time - order_time))
                   AS latency_seconds
        FROM trade_executions
        WHERE execution_time IS NOT NULL AND order_time IS NOT NULL
        """,
    )
    assert got == want and len(got) == 300


def test_financial_spread_and_imbalance(financial):
    eng, con = financial
    got = _rows(eng.streams["spread_monitoring"], drop=("event_time",))
    want = _oracle_rows(
        con,
        """
        SELECT symbol, exchange, bid_price, ask_price,
               (ask_price - bid_price) / bid_price * 10000 AS spread_bps
        FROM market_data WHERE bid_price > 0 AND ask_price > 0
        """,
    )
    assert got == want

    got = _rows(eng.streams["order_imbalance_alerts"], drop=("event_time",))
    want = _oracle_rows(
        con,
        """
        SELECT symbol, exchange, bid_volume, ask_volume,
               bid_volume / NULLIF(ask_volume, 0) AS imbalance_ratio,
               CASE WHEN bid_volume > ask_volume * 2 THEN 'buy_side'
                    WHEN ask_volume > bid_volume * 2 THEN 'sell_side'
                    ELSE 'balanced' END AS imbalance_direction
        FROM order_book_snapshots WHERE bid_volume > 0 AND ask_volume > 0
        """,
    )
    assert got == want and len(got) > 0
