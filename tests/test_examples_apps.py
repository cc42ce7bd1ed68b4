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
               -- DOUBLE: the reference's CAST(.. AS FLOAT) is f64
               -- (types.rs:781) and the dialect now maps it so; DuckDB's
               -- FLOAT is float32 and would drift in the 9th digit
               AVG(CAST(payload->>'$.price' AS DOUBLE)) AS avg_price
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

    def mk(i, content, likes, shares, comments, views, follower, user=None,
           ts_off=None):
        # ts_off pins a cohort to ONE timestamp: cohorts whose test crosses
        # a HAVING COUNT(*) threshold inside an hour bucket must not
        # straddle a bucket boundary — with the default 0-240s jitter the
        # whole suite went red whenever the fixture ran in the last four
        # minutes of a wall-clock hour (130 posts split 70/60 across two
        # buckets, both under the >100 threshold on BOTH engines).
        off = ts_off if ts_off is not None else int(rng.integers(0, 240))
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
            "timestamp": base + dt.timedelta(seconds=off),
        }

    i = 0
    # 130 posts sharing one 20-char hashtag prefix → trending (HAVING > 100);
    # single timestamp so the cohort always lands in ONE hour bucket
    for _ in range(130):
        rows.append(
            mk(i, "#megasale this week only wow", 10, 2, 1, 500, 100, ts_off=0)
        )
        i += 1
    # viral posts: engagement > 10000 and rate > 0.1
    for _ in range(8):
        rows.append(mk(i, "I love this amazing product!!!", 9000, 800, 300, 20000, 5000))
        i += 1
    # influencer: one user with 9 posts and > 10k followers (pinned to one
    # hour bucket — the HAVING > 5 splits under a 240s straddle too)
    for _ in range(9):
        rows.append(
            mk(i, "daily great thoughts of an influencer", 50, 5, 2, 800,
               50000, user=7, ts_off=0)
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


# ---------------------------------------------------------------------------
# ecommerce_with_metrics.sql — FR-073 SQL-native observability app
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def ecom_metrics(spark):
    from velostream_spark.sql.engine import SqlEngine

    rng = np.random.default_rng(23)
    n = 300
    base = _now() - dt.timedelta(minutes=10)
    ts = [base + dt.timedelta(seconds=int(i)) for i in range(n)]

    orders = pd.DataFrame(
        {
            "order_id": np.arange(1, n + 1),
            "status": rng.choice(["completed", "failed", "pending"], n),
            "payment_method": rng.choice(["credit_card", "paypal"], n),
            "region": rng.choice(["us-east", "eu-west"], n),
            "order_total": np.round(rng.uniform(5, 900, n), 2),
            "cart_time": ts,
            "checkout_time": [
                t + dt.timedelta(milliseconds=int(ms))
                for t, ms in zip(ts, rng.integers(50, 40_000, n))
            ],
            "event_time": ts,
        }
    )
    enriched_orders = pd.DataFrame(
        {
            "order_id": np.arange(1, n + 1),
            "customer_id": rng.integers(1, 50, n),
            "lifetime_value": np.round(rng.uniform(0, 20000, n), 2),
            "region": rng.choice(["us-east", "eu-west"], n),
            "payment_method": rng.choice(["credit_card", "paypal"], n),
            "order_total": np.round(rng.uniform(5, 2000, n), 2),
            "event_time": ts,
        }
    )
    cart_events = pd.DataFrame(
        {
            "cart_id": np.arange(1, n + 1),
            "checkout_started": rng.random(n) < 0.3,
            "items_added": rng.integers(0, 6, n),
            "region": rng.choice(["us-east", "eu-west"], n),
            "cart_total": np.round(rng.uniform(1, 400, n), 2),
            "abandoned": rng.random(n) < 0.5,
            "event_time": ts,
        }
    )
    payment_transactions = pd.DataFrame(
        {
            "payment_id": np.arange(1, n + 1),
            "order_id": rng.integers(1, n, n),
            "payment_method": rng.choice(["credit_card", "paypal"], n),
            "success": rng.random(n) < 0.8,
            "retry_count": rng.integers(0, 3, n),
            "failure_reason": [
                None if ok else "declined" for ok in rng.random(n) < 0.7
            ],
            "started_time": ts,
            "completed_time": [
                t + dt.timedelta(milliseconds=int(ms))
                for t, ms in zip(ts, rng.integers(20, 8_000, n))
            ],
            "event_time": ts,
        }
    )
    inventory_snapshots = pd.DataFrame(
        {
            "product_id": np.arange(1, n + 1),
            "product_category": rng.choice(["tech", "home"], n),
            "warehouse": rng.choice(["w1", "w2"], n),
            "inventory_level": rng.integers(0, 120, n),
            "reorder_point": rng.integers(20, 80, n),
            "event_time": ts,
        }
    )
    page_load_events = pd.DataFrame(
        {
            "session_id": np.arange(1, n + 1),
            "page_type": rng.choice(["home", "product", "cart"], n),
            "device_type": rng.choice(["mobile", "desktop"], n),
            "region": rng.choice(["us-east", "eu-west"], n),
            "load_time_seconds": np.round(rng.uniform(0.1, 6, n), 3),
            "event_time": ts,
        }
    )
    search_events = pd.DataFrame(
        {
            "search_id": np.arange(1, n + 1),
            "query_text": [f"q{i % 17}" for i in range(n)],
            "result_count": rng.integers(0, 600, n),
            "device_type": rng.choice(["mobile", "desktop"], n),
            "region": rng.choice(["us-east", "eu-west"], n),
            "event_time": ts,
        }
    )
    return_requests = pd.DataFrame(
        {
            "return_id": np.arange(1, n + 1),
            "order_id": rng.integers(1, n, n),
            "product_category": rng.choice(["tech", "home"], n),
            "return_reason": rng.choice(["damaged", "wrong_size"], n),
            "region": rng.choice(["us-east", "eu-west"], n),
            "return_value": np.round(rng.uniform(5, 500, n), 2),
            "event_time": ts,
        }
    )
    shipment_tracking = pd.DataFrame(
        {
            "shipment_id": np.arange(1, n + 1),
            "order_id": rng.integers(1, n, n),
            "shipping_method": rng.choice(["ground", "air"], n),
            "region": rng.choice(["us-east", "eu-west"], n),
            "carrier": rng.choice(["ups", "fedex"], n),
            "shipped_time": ts,
            "delivered_time": [
                t + dt.timedelta(seconds=int(sec))
                for t, sec in zip(ts, rng.integers(6 * 3600, 300 * 3600, n))
            ],
            "promised_hours": rng.integers(24, 168, n).astype("float"),
            "event_time": ts,
        }
    )

    frames = {
        "orders": orders,
        "enriched_orders": enriched_orders,
        "cart_events": cart_events,
        "payment_transactions": payment_transactions,
        "inventory_snapshots": inventory_snapshots,
        "page_load_events": page_load_events,
        "search_events": search_events,
        "return_requests": return_requests,
        "shipment_tracking": shipment_tracking,
    }
    eng = SqlEngine(spark)
    for name, pdf in frames.items():
        eng.register_stream(name, _with_event_time(spark, pdf, "event_time"))
    eng.execute_app(_read_app("ecommerce_with_metrics"))
    return eng, _oracle_con(frames)


def test_ecom_metrics_all_streams_and_bindings(ecom_metrics):
    eng, _ = ecom_metrics
    assert set(eng.streams) >= {
        "order_metrics",
        "high_value_orders",
        "cart_abandonment",
        "payment_processing",
        "inventory_alerts",
        "page_performance",
        "product_search",
        "returns_and_refunds",
        "shipping_performance",
    }
    # all 16 declared metrics bound to their streams
    assert len(eng.metrics) == 16
    assert eng.metrics["velo_orders_total"][0] == "order_metrics"
    assert eng.metrics["velo_shipping_latency_hours"][0] == "shipping_performance"


def test_ecom_metrics_order_stream_oracle(ecom_metrics):
    eng, con = ecom_metrics
    got = _rows(eng.streams["order_metrics"], drop=("event_time",))
    want = _oracle_rows(
        con,
        """
        SELECT order_id, status, payment_method, region, order_total,
               EPOCH(checkout_time - cart_time) AS processing_time_seconds
        FROM orders WHERE checkout_time IS NOT NULL AND cart_time IS NOT NULL
        """,
    )
    assert got == want and len(got) == 300


def test_ecom_metrics_shipping_lateral_alias(ecom_metrics):
    """shipping_performance references its own alias shipping_hours in the
    same SELECT (lateral column alias) and in the late-delivery CASE."""
    eng, con = ecom_metrics
    got = _rows(eng.streams["shipping_performance"], drop=("event_time",))
    want = _oracle_rows(
        con,
        """
        SELECT shipment_id, order_id, shipping_method, region, carrier,
               EPOCH(delivered_time - shipped_time) / 3600 AS shipping_hours,
               promised_hours,
               CASE WHEN (EPOCH(delivered_time - shipped_time) / 3600 - promised_hours) > 48 THEN 'severe'
                    WHEN (EPOCH(delivered_time - shipped_time) / 3600 - promised_hours) > 24 THEN 'moderate'
                    ELSE 'minor' END AS delay_severity
        FROM shipment_tracking
        WHERE delivered_time IS NOT NULL AND shipped_time IS NOT NULL
        """,
    )
    assert got == want


def test_ecom_metrics_conditional_counter(ecom_metrics):
    """velo_high_value_orders_total: counter with @metric_condition over
    the derived customer_tier column."""
    eng, con = ecom_metrics
    got = sorted(
        (r["region"], r["payment_method"], r["customer_tier"], r["value"])
        for r in eng.metric_values("velo_high_value_orders_total").collect()
    )
    want = sorted(
        tuple(t)
        for t in con.execute(
            """
            SELECT region, payment_method,
                   CASE WHEN lifetime_value > 10000 THEN 'vip'
                        WHEN lifetime_value > 1000 THEN 'gold'
                        WHEN lifetime_value > 100 THEN 'silver'
                        ELSE 'bronze' END AS customer_tier,
                   CAST(COUNT(*) AS DOUBLE)
            FROM enriched_orders WHERE order_total > 500
            GROUP BY 1, 2, 3
            """
        ).fetchall()
    )
    assert got == want and len(got) > 0


def test_ecom_metrics_histogram_oracle(ecom_metrics):
    """velo_search_results_count: cumulative bucket counts per label set."""
    eng, con = ecom_metrics
    rows = eng.metric_values("velo_search_results_count").collect()
    got = sorted(
        (r["result_status"], r["device_type"], r["le"], round(r["value"], 6))
        for r in rows
    )
    want = []
    for le in ("1", "5", "10", "25", "50", "100", "250", "500"):
        want += con.execute(
            f"""
            SELECT CASE WHEN result_count = 0 THEN 'no_results'
                        WHEN result_count < 10 THEN 'low_results'
                        ELSE 'good_results' END AS s, device_type, '{le}',
                   CAST(SUM(CASE WHEN result_count <= {le} THEN 1 ELSE 0 END) AS DOUBLE)
            FROM search_events GROUP BY 1, 2
            """
        ).fetchall()
    for le_expr, le_name in (("COUNT(*)", "+Inf"), ("SUM(result_count)", "_sum"), ("COUNT(*)", "_count")):
        want += con.execute(
            f"""
            SELECT CASE WHEN result_count = 0 THEN 'no_results'
                        WHEN result_count < 10 THEN 'low_results'
                        ELSE 'good_results' END AS s, device_type, '{le_name}',
                   CAST({le_expr} AS DOUBLE)
            FROM search_events GROUP BY 1, 2
            """
        ).fetchall()
    want = sorted((s, d, le, round(float(v), 6)) for s, d, le, v in want)
    assert got == want


def test_ecom_metrics_gauge_last_value(ecom_metrics):
    """velo_page_load_seconds: gauge = last value per label set by event
    time (metrics_helper.rs gauge.set fold)."""
    eng, con = ecom_metrics
    got = sorted(
        (r["page_type"], r["device_type"], r["region"], round(r["value"], 6))
        for r in eng.metric_values("velo_page_load_seconds").collect()
    )
    want = sorted(
        (p, d, reg, round(float(v), 6))
        for p, d, reg, v in con.execute(
            """
            SELECT page_type, device_type, region, load_time_seconds
            FROM page_load_events
            QUALIFY ROW_NUMBER() OVER (
              PARTITION BY page_type, device_type, region
              ORDER BY event_time DESC) = 1
            """
        ).fetchall()
    )
    assert got == want


def test_ecom_metrics_prometheus_exposition(ecom_metrics):
    eng, con = ecom_metrics
    text = eng.prometheus_text()
    assert "# TYPE velo_orders_total counter" in text
    assert "# TYPE velo_page_load_seconds gauge" in text
    assert "# TYPE velo_shipping_latency_hours histogram" in text
    (n_slow,) = con.execute(
        "SELECT COUNT(*) FROM page_load_events WHERE load_time_seconds > 2.0"
    ).fetchone()
    total = sum(
        int(line.rsplit(" ", 1)[1])
        for line in text.splitlines()
        if line.startswith("velo_slow_page_loads_total{")
    )
    assert total == n_slow


# ---------------------------------------------------------------------------
# iot_monitoring_with_metrics.sql — nested-metadata metric labels
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def iot_metrics(spark):
    from velostream_spark.sql.engine import SqlEngine

    rng = np.random.default_rng(29)
    n = 300
    base = _now() - dt.timedelta(minutes=10)
    ts = [base + dt.timedelta(seconds=int(i)) for i in range(n)]
    regions = [str(x) for x in rng.choice(["us-east", "eu-west"], n)]
    dcs = [str(x) for x in rng.choice(["dc1", "dc2"], n)]
    zones = [str(x) for x in rng.choice(["zone-a", "zone-b"], n)]

    def meta_maps():
        return [
            {
                "region": r,
                "datacenter": d,
                "zone": z,
                "facility": f"f{i % 3}",
                "facility_id": f"fid{i % 3}",
                "network_type": ["wifi", "lte"][i % 2],
            }
            for i, (r, d, z) in enumerate(zip(regions, dcs, zones))
        ]

    device_telemetry = pd.DataFrame(
        {
            "device_id": [f"dev{i % 40}" for i in range(n)],
            "device_type": rng.choice(["temp_sensor", "pump"], n),
            "temperature": np.round(rng.uniform(-30, 130, n), 2),
            "pressure": np.round(rng.uniform(5, 210, n), 2),
            "battery_percent": np.round(rng.uniform(0, 100, n), 1),
            "power_mode": rng.choice(["normal", "saver"], n),
            "metadata": meta_maps(),
            "event_time": ts,
        }
    )
    device_network_events = pd.DataFrame(
        {
            "device_id": [f"dev{i % 40}" for i in range(n)],
            "device_type": rng.choice(["temp_sensor", "pump"], n),
            "connection_state": rng.choice(["connected", "dropped"], n),
            "signal_strength": np.round(rng.uniform(-110, -40, n), 1),
            "latency_ms": np.round(rng.uniform(0.5, 4800, n), 2),
            "metadata": meta_maps(),
            "event_time": ts,
        }
    )
    device_logs = pd.DataFrame(
        {
            "device_id": [f"dev{i % 40}" for i in range(n)],
            "device_type": rng.choice(["temp_sensor", "pump"], n),
            "error_type": rng.choice(["io", "net", "fw"], n),
            "error_code": rng.integers(100, 600, n),
            "severity": rng.choice(
                ["info", "warning", "error", "critical", "fatal"], n
            ),
            "error_message": [f"msg{i}" for i in range(n)],
            "metadata": meta_maps(),
            "event_time": ts,
        }
    )
    sensor_readings = pd.DataFrame(
        {
            "device_id": [f"dev{i % 40}" for i in range(n)],
            "device_type": rng.choice(["temp_sensor", "pump"], n),
            "sensor_type": rng.choice(["temp", "flow"], n),
            "reading_value": np.round(rng.uniform(50, 150, n), 3),
            "expected_value": np.round(rng.uniform(80, 120, n), 3),
            "metadata": meta_maps(),
            "event_time": ts,
        }
    )
    device_lifecycle_events = pd.DataFrame(
        {
            "device_id": [f"dev{i % 40}" for i in range(n)],
            "device_type": rng.choice(["temp_sensor", "pump"], n),
            "restart_reason": rng.choice(["crash", "update"], n),
            "current_time": ts,
            "last_restart_time": [
                t - dt.timedelta(seconds=int(sec))
                for t, sec in zip(ts, rng.integers(3600, 400 * 3600, n))
            ],
            "metadata": meta_maps(),
            "event_time": ts,
        }
    )
    # facility_sensors: metadata is a NESTED STRUCT (location/facility
    # objects) — exercises multi-level dotted label paths
    facility_rows = [
        (
            f"fac{i % 5}",
            float(np.round(rng.uniform(15, 35), 2)),
            float(np.round(rng.uniform(20, 80), 1)),
            {
                "location": {
                    "country": ["us", "de"][i % 2],
                    "region": ["east", "west"][i % 2],
                    "city": ["nyc", "ber"][i % 2],
                },
                "facility": {"name": f"plant{i % 3}", "zone": ["a", "b"][i % 2]},
            },
            ts[i],
        )
        for i in range(n)
    ]
    facility_sensors_df = spark.createDataFrame(
        facility_rows,
        "facility_id string, ambient_temperature double, humidity_percent double, "
        "metadata struct<location: struct<country: string, region: string, city: string>, "
        "facility: struct<name: string, zone: string>>, event_time timestamp",
    )
    sensor_data_quality = pd.DataFrame(
        {
            "device_id": [f"dev{i % 40}" for i in range(n)],
            "device_type": rng.choice(["temp_sensor", "pump"], n),
            "sensor_type": rng.choice(["temp", "flow"], n),
            "expected_reading_count": rng.integers(1, 100, n),
            "actual_reading_count": rng.integers(0, 100, n),
            "metadata": meta_maps(),
            "event_time": ts,
        }
    )

    eng = SqlEngine(spark)
    frames = {}
    for name, pdf in {
        "device_telemetry": device_telemetry,
        "device_network_events": device_network_events,
        "device_logs": device_logs,
        "sensor_readings": sensor_readings,
        "device_lifecycle_events": device_lifecycle_events,
        "sensor_data_quality": sensor_data_quality,
    }.items():
        flat = pdf.drop(columns=["metadata"]).assign(
            meta_region=[m["region"] for m in pdf["metadata"]],
            meta_datacenter=[m["datacenter"] for m in pdf["metadata"]],
            meta_network_type=[m["network_type"] for m in pdf["metadata"]],
            meta_facility_id=[m["facility_id"] for m in pdf["metadata"]],
        )
        frames[name] = flat
        sdf = spark.createDataFrame(pdf).withColumn(
            "_event_time", F.col("event_time")
        )
        eng.register_stream(name, sdf)
    eng.register_stream(
        "facility_sensors",
        facility_sensors_df.withColumn("_event_time", F.col("event_time")),
    )
    eng.execute_app(_read_app("iot_monitoring_with_metrics"))
    return eng, _oracle_con(frames)


def test_iot_metrics_all_streams_and_bindings(iot_metrics):
    eng, _ = iot_metrics
    assert set(eng.streams) >= {
        "temperature_monitoring",
        "pressure_monitoring",
        "battery_monitoring",
        "connectivity_monitoring",
        "device_errors",
        "sensor_quality",
        "uptime_tracking",
        "facility_environment",
        "data_quality",
    }
    assert len(eng.metrics) == 18


def test_iot_metrics_sensor_quality_stream(iot_metrics):
    eng, con = iot_metrics
    got = _rows(
        eng.streams["sensor_quality"], drop=("event_time", "metadata")
    )
    want = _oracle_rows(
        con,
        """
        SELECT device_id, device_type, sensor_type, reading_value, expected_value,
               ABS((reading_value - expected_value) / expected_value * 100) AS deviation_percent,
               CASE WHEN ABS(reading_value - expected_value) > expected_value * 0.2 THEN 'severe'
                    WHEN ABS(reading_value - expected_value) > expected_value * 0.1 THEN 'moderate'
                    WHEN ABS(reading_value - expected_value) > expected_value * 0.05 THEN 'minor'
                    ELSE 'normal' END AS anomaly_type,
               (ABS(reading_value - expected_value) > expected_value * 0.05) AS is_anomalous,
               meta_region, meta_datacenter, meta_network_type, meta_facility_id
        FROM sensor_readings WHERE expected_value IS NOT NULL AND expected_value != 0
        """,
    )
    # oracle carries flattened meta; engine carries the map — compare the
    # shared prefix columns only
    got = [t[:8] for t in got]
    want = [t[:8] for t in want]
    assert sorted(got, key=repr) == sorted(want, key=repr) and len(got) == 300


def test_iot_metrics_nested_label_counter(iot_metrics):
    """velo_critical_device_errors_total: nested map labels + OR condition."""
    eng, con = iot_metrics
    got = sorted(
        (
            r["metadata_region"],
            r["metadata_facility_id"],
            r["error_type"],
            r["device_type"],
            r["value"],
        )
        for r in eng.metric_values("velo_critical_device_errors_total").collect()
    )
    want = sorted(
        tuple(t)
        for t in con.execute(
            """
            SELECT meta_region, meta_facility_id, error_type, device_type,
                   CAST(COUNT(*) AS DOUBLE)
            FROM device_logs
            WHERE severity IN ('warning','error','critical','fatal')
              AND (severity = 'critical' OR severity = 'fatal')
            GROUP BY 1, 2, 3, 4
            """
        ).fetchall()
    )
    assert got == want and len(got) > 0


def test_iot_metrics_two_level_nested_struct_gauge(iot_metrics):
    """velo_facility_ambient_temperature_celsius: metadata.location.country
    etc. — two-level struct paths (label_extraction.rs nested walk)."""
    eng, _ = iot_metrics
    rows = eng.metric_values(
        "velo_facility_ambient_temperature_celsius"
    ).collect()
    # country/zone alternate with i%2, facility name with i%3 → 6 label sets
    assert len(rows) == 6
    cols = {
        "metadata_location_country",
        "metadata_location_region",
        "metadata_location_city",
        "metadata_facility_name",
        "metadata_facility_zone",
        "value",
    }
    assert cols <= set(rows[0].asDict())
    text = eng.prometheus_text()
    assert 'metadata.location.country="us"' in text


def test_iot_metrics_connection_latency_histogram_count(iot_metrics):
    eng, con = iot_metrics
    rows = eng.metric_values("velo_connection_latency_ms").collect()
    inf_total = sum(r["value"] for r in rows if r["le"] == "+Inf")
    (want,) = con.execute("SELECT COUNT(*) FROM device_network_events").fetchone()
    assert inf_total == want


# ---------------------------------------------------------------------------
# test_emit_changes.sql / test_simple_validation.sql — the two remaining
# runnable examples files (test_parsing_error.sql is the reference's own
# intentionally-failing file, exempted by its validation test)
# ---------------------------------------------------------------------------


def test_example_emit_changes_executes(spark):
    """examples/test_emit_changes.sql verbatim: stateless EMIT CHANGES is
    the per-record passthrough changelog."""
    from velostream_spark.sql.engine import SqlEngine

    eng = SqlEngine(spark)
    eng.register_stream(
        "users",
        spark.createDataFrame(
            [(1, "ann"), (2, "bo"), (3, "cy")], "id int, name string"
        ),
    )
    eng.execute_app(_read_app("test_emit_changes"))
    rows = sorted(
        (r["id"], r["name"]) for r in eng.streams["test"].collect()
    )
    assert rows == [(1, "ann"), (2, "bo"), (3, "cy")]


def test_example_simple_validation_flags_unconfigured_source(spark):
    """examples/test_simple_validation.sql: the validator accepts the
    configured statement (source WITH + INTO sink WITH double-config) and
    flags the one reading from an unconfigured source — the file's
    documented purpose."""
    from velostream_spark.sql.engine import SqlEngine

    eng = SqlEngine(spark)
    rep = eng.validate(_read_app("test_simple_validation"))
    msgs = " ".join(rep.errors + rep.warnings).lower()
    assert "unconfigured_source" in msgs
    assert "test_source" not in msgs  # the configured statement is clean
