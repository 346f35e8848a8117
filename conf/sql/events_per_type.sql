----param---- 'repartition': 1 ----
SELECT event_type, user_id, count(*) AS n
FROM events
GROUP BY event_type, user_id
