from .base import Connector, SalesforceConnector, MarketingCloudConnector, get_connector
from .mock_salesforce import MockSalesforceConnector
from .mock_marketing_cloud import MockMarketingCloudConnector

__all__ = [
    "Connector",
    "SalesforceConnector",
    "MarketingCloudConnector",
    "get_connector",
    "MockSalesforceConnector",
    "MockMarketingCloudConnector",
]
