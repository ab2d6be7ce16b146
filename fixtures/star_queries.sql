--============================================================================
-- Star-schema query library (graft engine fixture, reference file format)
--============================================================================


-- Check record counts across the star
-- Purpose: Verify data has been loaded into all star tables
SELECT 'fact_transactions' AS table_name, COUNT(*) AS record_count FROM fact_transactions
UNION ALL
SELECT 'dim_category', COUNT(*) FROM dim_category
UNION ALL
SELECT 'dim_user', COUNT(*) FROM dim_user
ORDER BY table_name;


-- Monthly spend trend
-- Purpose: Total transaction amount per calendar month
SELECT d.year, d.month, ROUND(SUM(f.amount), 2) AS total_amount
FROM fact_transactions f
JOIN dim_date d ON f.date_key = d.date_key
GROUP BY d.year, d.month
ORDER BY d.year, d.month;


-- Top merchants by revenue
-- Purpose: Rank merchants by total transaction amount
-- Purpose: (top 5 only)
WITH ranked AS (
  SELECT m.merchant_name, SUM(f.amount) AS total
  FROM fact_transactions f
  JOIN dim_merchant m ON f.merchant_key = m.merchant_key
  GROUP BY m.merchant_name
)
SELECT merchant_name, ROUND(total, 2) AS total
FROM ranked
ORDER BY total DESC, merchant_name
LIMIT 5;


SELECT COUNT(*) AS weekend_txns
FROM fact_transactions f
JOIN dim_date d ON f.date_key = d.date_key
WHERE d.is_weekend;
