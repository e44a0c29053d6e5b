"""Mock Marketing Cloud connector (canned responses from the reference
harness, integration_tests/dbt_project.yml:63-92).

- ensure_data_extension (mock lines 68-72): existence flags + success;
- stage_batch (lines 73-78): opaque staged-query id ('abcd' in the
  reference; we keep one id per connector instance so the any_value
  collapse semantics of the reference pipeline hold);
- fetch_results (lines 85-92): {success: true} per row;
- wait_for_import: the reference harness NEVER mocks
  SFMC_AWAIT_RESULTS_POLL (dbt_project.yml gap noted in SURVEY.md §5);
  we add it returning True, as FIXTURES.md §5 prescribes.
"""

from __future__ import annotations

from .base import MarketingCloudConnector, register_connector


class MockMarketingCloudConnector(MarketingCloudConnector):
    def __init__(self, stage_id: str = "abcd", call_log: str | None = None):
        self.stage_id = stage_id
        self.managed: list[dict] = []
        self.imports: list[tuple] = []
        # See MockSalesforceConnector.call_log: file-based tally because
        # executor-side calls happen in forked Python workers.
        self.call_log = call_log

    def _tally(self, kind: str, n: int) -> None:
        if self.call_log:
            with open(self.call_log, "a") as f:
                f.write(f"{kind},{n}\n")

    def ensure_data_extension(self, configuration):
        self.managed.append(configuration)
        return {
            "data_extension_all_fields_existed": True,
            "data_extension_existed": True,
            "success": True,
        }

    def stage_batch(self, rows):
        self._tally("stage_batch", len(rows))
        return self.stage_id

    def start_import(self, configuration, stage_id):
        self.imports.append((configuration, stage_id))
        return f"import-{stage_id}"

    def wait_for_import(self, handle):
        return True

    def fetch_results(self, stage_id, row_indices):
        self._tally("fetch_results", len(row_indices))
        return [{"success": True} for _ in row_indices]


register_connector("marketing_cloud", MockMarketingCloudConnector)
