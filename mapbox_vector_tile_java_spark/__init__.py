"""PySpark-native per-column lightweight-compression engine.

A from-scratch re-targeting of the encode/decode discipline of
``sebasbaumh/mapbox-vector-tile-java`` (JTS geometry -> MVT protobuf wire
format: zig-zag deltas, packed varints, layer-global dictionaries,
opcode+run-length headers, round-trip-equality testing) into a general
columnar codec suite for Common-Crawl-style webtext tables:

- dictionary encoding (local and global-broadcast) .... ref MvtLayerProps.java:33-60
- run-length encoding with capped runs ................ ref MvtUtil.java:29,102-105
- FSST-style symbol-table string compression .......... (new; reference has none)
- frame-of-reference + delta + zig-zag + bit-packing .. ref JtsAdapter.java:444-451,
                                                            MvtUtil.java:43-57
- stats-driven codec auto-selection ................... ref JtsGeomStats.java:48-153

Everything is DataFrame-first; all kernels are vectorized numpy/pyarrow
running inside ``mapInArrow`` (zero per-row Python).
"""

__version__ = "0.1.0"
