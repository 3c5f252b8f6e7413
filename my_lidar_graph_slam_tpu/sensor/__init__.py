"""Sensor data model: raw (host, variable-length) and device (fixed-width)."""

from my_lidar_graph_slam_tpu.sensor.data import (  # noqa: F401
    OdometryData,
    RawScan,
    ScanBatch,
    pack_scan,
    pack_scans,
)
