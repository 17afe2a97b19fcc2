"""Data plane (RESP) + control plane (HTTP) servers.

Rebuild of the reference's Garnet-hosted command set and ASP.NET control
plane (SURVEY §2.2, §2.5) as one asyncio process serving both protocols.
"""
