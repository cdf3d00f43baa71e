from horizongs_tpu.viewer.server import ViewerServer  # noqa: F401
