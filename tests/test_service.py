"""Job queue REST service tests — full lifecycle through the WSGI app."""

from __future__ import annotations

import io
import json
import time

from tsp_spark.service import (
    JobQueueService,
    make_spark_runner,
    make_wsgi_app,
    validate_patterns,
)


def wsgi_call(app, method, path, body=None):
    payload = json.dumps(body or {}).encode()
    status_headers = {}

    def start_response(code, headers):
        status_headers["code"] = code

    environ = {
        "REQUEST_METHOD": method,
        "PATH_INFO": path,
        "CONTENT_LENGTH": str(len(payload)),
        "wsgi.input": io.BytesIO(payload),
    }
    out = b"".join(app(environ, start_response))
    return status_headers["code"], json.loads(out)


def test_validate_patterns():
    fields = {"speed": "float64", "mode": "string"}
    res = validate_patterns(
        [
            {"id": 1, "sourceCode": "speed > 10 for 5 sec"},
            {"id": 2, "sourceCode": "speed >>>> nonsense"},
        ],
        fields,
    )
    assert res[0]["success"] is True
    assert res[1]["success"] is False and res[1]["error"]


def test_job_lifecycle(spark, events_small, tmp_path):
    src = tmp_path / "events"
    events_small.write.parquet(str(src))
    service = JobQueueService(make_spark_runner(spark), dequeue_interval_s=0.05)
    app = make_wsgi_app(service, fields_types={"value": "float64"})

    code, resp = wsgi_call(
        app,
        "POST",
        "/job/submit",
        {
            "uuid": "j1",
            "source": {
                "parquetPath": str(src),
                "datetimeField": "ts",
                "partitionFields": ["user_id"],
            },
            "patterns": [{"id": 1, "sourceCode": "value > 150 for 10 sec"}],
        },
    )
    assert code == "200 OK" and resp["uuid"] == "j1"

    deadline = time.time() + 60
    status = None
    while time.time() < deadline:
        code, status = wsgi_call(app, "GET", "/job/j1/status")
        if status.get("status") in ("finished", "failed"):
            break
        time.sleep(0.2)
    assert status["status"] == "finished", status
    assert status["rowsWritten"] > 0

    code, ov = wsgi_call(app, "GET", "/jobs/overview")
    assert code == "200 OK" and ov[0]["uuid"] == "j1"

    code, rq = wsgi_call(app, "GET", "/job/j1/request")
    assert rq["patterns"][0]["id"] == 1

    code, ver = wsgi_call(app, "GET", "/metainfo/getVersion")
    assert "version" in ver

    # queued job can be removed before it runs
    service2 = JobQueueService(make_spark_runner(spark), dequeue_interval_s=30)
    app2 = make_wsgi_app(service2)
    wsgi_call(app2, "POST", "/job/submit", {"uuid": "j2", "source": {}, "patterns": []})
    code, q = wsgi_call(app2, "GET", "/queue/show")
    assert [j["uuid"] for j in q] == ["j2"]
    code, rm = wsgi_call(app2, "POST", "/queue/j2/remove")
    assert rm["removed"] is True
    code, st = wsgi_call(app2, "GET", "/job/j2/status")
    assert st["status"] == "stopped"
    service.shutdown()
    service2.shutdown()
