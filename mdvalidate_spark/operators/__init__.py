"""Rule-family executors. Each module turns compiled rules into DataFrame
plans; none of them collect data to the driver except final small statistics
(drift scalars, manifest counters)."""
