"""Failure alerting — SMTP email to job owners.

Behavior parity with the reference's email alerts
(reference: yaetos/etl_utils.py:732-755, 1531-1536). Message assembly
is pure (testable); the network send is the last line and only runs
when invoked with a real SMTP host.
"""

from __future__ import annotations

import smtplib
from email.message import EmailMessage


def build_failure_email(
    job_name: str,
    error: str,
    owners: list[str],
    sender: str = "yaetos_spark@localhost",
) -> EmailMessage:
    msg = EmailMessage()
    msg["Subject"] = f"[yaetos_spark] job '{job_name}' failed"
    msg["From"] = sender
    msg["To"] = ", ".join(owners)
    msg.set_content(f"Job: {job_name}\n\nError:\n{error}\n")
    return msg


def send_failure_email(
    job_name: str,
    error: str,
    owners: list[str],
    smtp_host: str,
    smtp_port: int = 25,
    sender: str = "yaetos_spark@localhost",
) -> None:
    msg = build_failure_email(job_name, error, owners, sender)
    with smtplib.SMTP(smtp_host, smtp_port) as s:
        s.send_message(msg)
