"""Minimal MCP (Model Context Protocol) stdio server + client.

The reference exposes its solvers through FastMCP over stdio
(fenics_mcp_server.py:1899, :4554).  This package implements the same wire
protocol (JSON-RPC 2.0, newline-delimited, initialize / tools/list /
tools/call) from scratch so the framework serves the identical 13-tool MCP
surface without third-party MCP dependencies.
"""
