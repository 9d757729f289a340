"""Web application layer: the DeepVision interview app rebuilt on a
stdlib WSGI micro-framework with an HTTP API compatible with the
reference's ``/api/**`` surface (reference web/server.py routes
:26935-45010)."""
